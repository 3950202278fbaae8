#!/bin/bash
# Round-3 battery 5: warm_iters sweep (EPE + retrieval gate) at both
# corpus scales. Run detached (nohup); retries once on tunnel failure.
cd /root/repo
log=/tmp/r3_battery5.log
echo "=== battery5 start $(date)" >> $log
echo "=== warm_iters gate scale 1 (3 seeds)" >> $log
for i in 1 2; do
  timeout 2400 python tools/flow_quality.py --warm_iters --seeds 0 1 2 --scale 1 >> $log 2>&1 && break
done
echo "=== warm_iters gate scale 2 seed 0" >> $log
for i in 1 2; do
  timeout 2400 python tools/flow_quality.py --warm_iters --seeds 0 --scale 2 >> $log 2>&1 && break
done
echo "=== battery5 done $(date)" >> $log
