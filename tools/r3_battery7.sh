#!/bin/bash
# Round-3 battery 7: compact-upload (host_gray) validation on the chip.
#   1. EPE + retrieval gate: host cv2 gray (area/linear) vs device gray
#      at the production flow config, both corpus scales.
#   2. e2e bench with/without host_gray (the lever is upload bytes).
# Waits for battery6 (e2e breakdown) to finish so the chip isn't shared.
cd /root/repo
log=/tmp/r3_battery7.log
echo "=== battery7 start $(date)" >> $log
until grep -q "battery6 done" /tmp/r3_battery6.log 2>/dev/null; do sleep 120; done
echo "=== battery6 finished, starting $(date)" >> $log
echo "=== host_gray gate scale 1 (3 seeds)" >> $log
for i in 1 2; do
  timeout 2400 env PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/flow_quality.py --host_gray --seeds 0 1 2 --scale 1 >> $log 2>&1 && break
done
echo "=== host_gray gate scale 2 seed 0" >> $log
for i in 1 2; do
  timeout 2400 env PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/flow_quality.py --host_gray --seeds 0 --scale 2 >> $log 2>&1 && break
done
echo "=== e2e bench (production, frames upload)" >> $log
for i in 1 2; do
  timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site \
    python bench.py --mode e2e >> $log 2>&1 && break
done
echo "=== e2e bench (host_gray compact upload)" >> $log
for i in 1 2; do
  timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site \
    python bench.py --mode e2e --host_gray >> $log 2>&1 && break
done
echo "=== battery7 done $(date)" >> $log
