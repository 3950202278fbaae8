#!/bin/bash
# Round-3 battery 8: batch_clips sweep on the device bench (54.8 at
# batch=8 — does 12/16 amortize per-program overhead past 55?), then a
# final full multi-metric bench at the best config. Runs after battery7.
cd /root/repo
log=/tmp/r3_battery8.log
echo "=== battery8 start $(date)" >> $log
until grep -q "battery7 done" /tmp/r3_battery7.log 2>/dev/null; do sleep 120; done
for bc in 12 16; do
  echo "=== bench extract batch_clips=$bc" >> $log
  for i in 1 2; do
    timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site \
      python bench.py --mode extract --batch_clips $bc >> $log 2>&1 && break
  done
done
echo "=== bench all (final, production)" >> $log
for i in 1 2; do
  timeout 3600 env PYTHONPATH=/root/repo:/root/.axon_site \
    python bench.py --mode all > /tmp/r3_bench_all2.json 2>> $log && break
done
cat /tmp/r3_bench_all2.json >> $log
echo "=== battery8 done $(date)" >> $log
