#!/bin/bash
# Round-5 continuation TPU queue (ONE TPU process at a time; shared
# mkdir lock with bench.py — see scripts/tpu_lock.sh and CLAUDE.md).
#
#   1. probe-wait for the tunneled chip (multi-hour outages happen)
#   2. scripts/tpu_parity_check.py (pjsvd) — recertify the kernel at the
#      CURRENT routing marker (v3-rect6: the round-5 polish-sweep bump
#      de-certified the committed v2 artifact, so without this the
#      production path silently falls back to the XLA SVD)
#   3. scripts/probe_zip_factor.py — w2 certificate-noise measurement of
#      the zip-rounding path (round-4 verdict item 3)
#
# bench.py (compile-cache warm + capture) runs AFTER this queue, once the
# artifact is committed and any w2 config adoption is decided — warming
# first and editing after would throw the warmed programs away.
#
# Usage: bash scripts/tpu_queue_r5b.sh /tmp/tpu_queue_r5b.log & echo $! > /tmp/tpu_queue_r5b.pid
LOG=${1:-/tmp/tpu_queue_r5b.log}
cd "$(dirname "$0")/.."
exec >>"$LOG" 2>&1
. scripts/tpu_lock.sh
rm -f /tmp/tpu_queue_r5b.done

probe() {
  timeout -k 10 150 python -c "
import jax, numpy as np, jax.numpy as jnp
d = jax.devices()
x = jnp.ones((128, 128), jnp.float32)
v = float(np.asarray((x @ x).sum().reshape(1, 1))[0, 0])
assert v == 128.0 * 128.0 * 128.0, v
print('TPU OK:', d)
"
}

echo "=== tpu_queue_r5b start $(date) ==="
until with_lock probe; do
  echo "tpu down $(date)"
  sleep 180
done

echo "=== TPU back $(date): tpu_parity_check --trunc svd --svd-impl pjsvd ==="
TNQS_SVD_IMPL=pjsvd with_lock timeout -k 30 5400 python scripts/tpu_parity_check.py \
  --trunc svd --svd-impl pjsvd \
  --out tests/golden/tpu_parity_chi64_pjsvd.json || echo "PARITY FAILED rc=$?"

echo "=== probe_zip_factor $(date) ==="
# takes the shared lock itself (bench.acquire_tpu_lock) and absorbs
# outages internally
timeout -k 30 9000 python scripts/probe_zip_factor.py || echo "ZIP PROBE FAILED rc=$?"

touch /tmp/tpu_queue_r5b.done
echo "=== tpu_queue_r5b done $(date) ==="
