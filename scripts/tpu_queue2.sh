#!/bin/bash
# Stage 2 of the TPU work queue: wait for scripts/tpu_queue.sh to finish
# its microbench + pjsvd parity chain (ordered on the /tmp/tpu_queue.done
# marker, with a dead-pid fallback so a crashed stage 1 doesn't block
# forever), then run the full benchmark — and, if the pjsvd parity
# artifact passed, a second bench with the Pallas SVD kernel enabled.
# ONE TPU process at a time throughout: bench.py holds the shared lock
# itself and now waits out chip outages internally (wait_for_tpu), so the
# benches get a 6h outage budget and an 8h wall clock.
#
# Usage: bash scripts/tpu_queue2.sh /tmp/tpu_queue2.log & echo $! > /tmp/tpu_queue2.pid
LOG=${1:-/tmp/tpu_queue2.log}
cd "$(dirname "$0")/.."
exec >>"$LOG" 2>&1

echo "=== tpu_queue2 start $(date) ==="
while [ ! -f /tmp/tpu_queue.done ]; do
  QPID=$(cat /tmp/tpu_queue.pid 2>/dev/null)
  if [ -n "$QPID" ] && ! kill -0 "$QPID" 2>/dev/null; then
    echo "stage 1 (pid $QPID) died without writing the done marker; proceeding"
    break
  fi
  sleep 60
done
echo "=== queue1 finished $(date): full bench ==="
TNQS_BENCH_TPU_WAIT=21600 timeout -k 60 28800 python bench.py || echo "BENCH FAILED rc=$?"

PASS=$(PALLAS_AXON_POOL_IPS= python - <<'PY'
import json, pathlib
p = pathlib.Path("tests/golden/tpu_parity_chi64_pjsvd.json")
ref = pathlib.Path("tests/golden/tpu_parity_chi64.json")
try:
    d = json.load(p.open()); r = json.load(ref.open())
    dev = max(d["dev_from_f64_per_layer"])
    floor = max(r["f32_floor_per_layer"])
    # pass if pjsvd stays within the flex-f32 control floor (the same
    # bar the xla-SVD artifact cleared)
    print("yes" if dev <= floor else "no")
except Exception:
    print("no")
PY
)
echo "pjsvd parity pass: $PASS"
if [ "$PASS" = "yes" ]; then
  echo "=== pjsvd bench $(date) ==="
  TNQS_SVD_IMPL=pjsvd TNQS_BENCH_TPU_WAIT=21600 timeout -k 60 28800 python bench.py || echo "PJSVD BENCH FAILED rc=$?"
fi
echo "=== tpu_queue2 done $(date) ==="
