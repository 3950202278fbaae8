#!/bin/bash
# Round-3 TPU measurement battery: waits for the tunnel, then runs the
# queued measurements sequentially. Logs to /tmp/r3_battery.log.
cd /root/repo
log=/tmp/r3_battery.log
echo "=== battery start $(date)" >> $log
# 1. wait for tunnel
while true; do
  timeout 120 python -c "
import jax, jax.numpy as jnp
print('probe ok', float((jnp.ones((128,128))@jnp.ones((128,128))).sum()))" >> $log 2>&1 && break
  echo "probe failed $(date +%H:%M:%S)" >> $log
  sleep 60
done
echo "=== tunnel up $(date)" >> $log
echo "=== cnn_roofline" >> $log
timeout 1200 python tools/cnn_roofline.py >> $log 2>&1
echo "=== flow_bench --warm" >> $log
timeout 1200 python tools/flow_bench.py --warm --pairs 500 --hw 128 128 >> $log 2>&1
echo "=== bench extract" >> $log
timeout 1200 python bench.py --mode extract >> $log 2>&1
echo "=== battery done $(date)" >> $log
