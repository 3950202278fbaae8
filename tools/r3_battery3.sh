#!/bin/bash
cd /root/repo
log=/tmp/r3_battery3.log
echo "=== battery3 start $(date)" >> $log
echo "=== warm-cam gate scale 1 (jitter corpus)" >> $log
for i in 1 2; do
  timeout 1700 python tools/flow_quality.py --warm --seeds 0 1 2 --scale 1 >> $log 2>&1 && break
done
echo "=== warm-cam gate scale 2 seed 0" >> $log
for i in 1 2; do
  timeout 1700 python tools/flow_quality.py --warm --seeds 0 --scale 2 >> $log 2>&1 && break
done
echo "=== battery3 done $(date)" >> $log
