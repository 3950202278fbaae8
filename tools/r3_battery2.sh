#!/bin/bash
cd /root/repo
log=/tmp/r3_battery2.log
echo "=== battery2 start $(date)" >> $log
for i in 1 2 3; do
  echo "=== bench extract attempt $i $(date +%H:%M)" >> $log
  timeout 1500 python bench.py --mode extract >> $log 2>&1 && break
done
echo "=== res_sweep EPE seed 0 scale 2 $(date +%H:%M)" >> $log
for i in 1 2; do
  timeout 1500 python tools/flow_quality.py --res_sweep --seeds 0 --scale 2 >> $log 2>&1 && break
done
echo "=== battery2 done $(date)" >> $log
