#!/bin/bash
# Round-3 battery 5: warm_iters sweep (EPE + retrieval gate) at both
# corpus scales, plus a fresh stage table, warm_iters speed deltas, and a
# full multi-metric bench. Run detached (nohup); retries once on tunnel
# failure per step.
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
echo "=== stage table (production)" >> $log
for i in 1 2; do
  timeout 1800 python tools/extract_stages.py >> $log 2>&1 && break
done
echo "=== bench extract warm_iters=6" >> $log
for i in 1 2; do
  timeout 1200 python bench.py --mode extract --warm_iters 6 >> $log 2>&1 && break
done
echo "=== bench extract warm_iters=4" >> $log
for i in 1 2; do
  timeout 1200 python bench.py --mode extract --warm_iters 4 >> $log 2>&1 && break
done
echo "=== bench all (production)" >> $log
for i in 1 2; do
  timeout 3600 python bench.py --mode all > /tmp/r3_bench_all.json 2>> $log && break
done
cat /tmp/r3_bench_all.json >> $log
echo "=== battery5 done $(date)" >> $log
