#!/bin/bash
cd /root/repo
log=/tmp/r3_battery4.log
echo "=== battery4 start $(date)" >> $log
echo "=== graymm gate scale 1 (3 seeds)" >> $log
for i in 1 2; do
  timeout 1700 python tools/flow_quality.py --gray --seeds 0 1 2 --scale 1 >> $log 2>&1 && break
done
echo "=== graymm gate scale 2 seed 0" >> $log
for i in 1 2; do
  timeout 1700 python tools/flow_quality.py --gray --seeds 0 --scale 2 >> $log 2>&1 && break
done
echo "=== bench extract (graymm) " >> $log
for i in 1 2; do
  timeout 900 python bench.py --mode extract --batches 8 >> $log 2>&1 && break
done
echo "=== battery4 done $(date)" >> $log
