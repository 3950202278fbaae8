#!/bin/bash
# TPU measurement battery: waits for the (sometimes flaky) tunneled TPU
# backend to come up, then runs the standard measurement set sequentially,
# logging to /tmp/tpu_battery.log. Run it detached and read the log:
#
#   tools/tpu_battery.sh &            # full battery
#   tools/tpu_battery.sh bench        # just the headline bench
#
# Sequential on purpose: the build container exposes ONE CPU core, so
# concurrent XLA compilations starve each other — never run this at the
# same time as the test suite.
#
# The probe loop is the pattern to copy for any ad-hoc TPU measurement:
# the tunnel drops for minutes at a time, and the first call after it
# returns pays backend init, so probe with a real tiny computation.
cd "$(dirname "$0")/.." || exit 1
log=/tmp/tpu_battery.log
what=${1:-all}
echo "=== battery($what) start $(date)" >> "$log"

until timeout 120 python -c "
import jax, jax.numpy as jnp
jax.devices(); float(jnp.sum(jnp.ones((8,128))))" >/dev/null 2>&1; do
  echo "[probe] tunnel down $(date)" >> "$log"
  sleep 120
done
echo "=== tunnel up $(date)" >> "$log"

run() {  # run <timeout_s> <cmd...>  — one retry on failure
  local t=$1; shift
  echo "=== $* ($(date +%H:%M:%S))" >> "$log"
  for _ in 1 2; do timeout "$t" "$@" >> "$log" 2>&1 && break; done
}

case "$what" in
  bench)
    run 3600 python bench.py --mode all ;;
  flow)
    run 1200 python tools/flow_bench.py --pairs 500 --hw 128 128
    run 1200 python tools/flow_bench.py --warm --pairs 500 --hw 128 128 ;;
  roofline)
    run 1200 python tools/cnn_roofline.py ;;
  all)
    run 1200 python tools/cnn_roofline.py
    run 1200 python tools/flow_bench.py --warm --pairs 500 --hw 128 128
    run 3600 python bench.py --mode all ;;
  *)
    echo "usage: $0 [all|bench|flow|roofline]" >> "$log"; exit 2 ;;
esac
echo "=== battery($what) done $(date)" >> "$log"
