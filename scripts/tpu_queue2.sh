#!/bin/bash
# Stage 2 of the TPU work queue: wait for scripts/tpu_queue.sh (pid in
# /tmp/tpu_queue.pid) to finish its microbench + pjsvd parity chain, then
# run the full benchmark — and, if the pjsvd parity artifact passed, a
# second bench with the Pallas SVD kernel enabled.  ONE TPU process at a
# time throughout (see CLAUDE.md).
#
# Usage: bash scripts/tpu_queue2.sh /tmp/tpu_queue2.log & echo $! > /tmp/tpu_queue2.pid
LOG=${1:-/tmp/tpu_queue2.log}
cd "$(dirname "$0")/.."
exec >>"$LOG" 2>&1

echo "=== tpu_queue2 start $(date) ==="
QPID=$(cat /tmp/tpu_queue.pid 2>/dev/null)
while [ -n "$QPID" ] && kill -0 "$QPID" 2>/dev/null; do
  sleep 60
done
echo "=== queue1 finished $(date): full bench ==="
timeout 7200 python bench.py || echo "BENCH FAILED rc=$?"

PASS=$(python - <<'PY'
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
  TNQS_SVD_IMPL=pjsvd timeout 7200 python bench.py || echo "PJSVD BENCH FAILED rc=$?"
fi
echo "=== tpu_queue2 done $(date) ==="
