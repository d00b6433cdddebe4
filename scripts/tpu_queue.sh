#!/bin/bash
# Wait for the tunneled TPU to come back, then run the round-3 pjsvd
# validation chain sequentially (ONE TPU process at a time — concurrent
# axon processes wedge the chip; see CLAUDE.md).  Every TPU touch holds
# /tmp/tnqs_tpu.lock (scripts/tpu_lock.sh, shared with bench.py's
# acquire_tpu_lock()), so a driver-launched bench and this queue never
# overlap on the chip.  Writes /tmp/tpu_queue.done when finished so
# stage 2 (tpu_queue2.sh) can order on a marker instead of a recyclable
# pid.
#
#   1. scripts/microbench_svd.py            — pjsvd vs XLA SVD speed/accuracy
#   2. scripts/tpu_parity_check.py (pjsvd)  — 10-layer chi=64 Eagle trajectory
#
# Usage:  bash scripts/tpu_queue.sh /tmp/tpu_queue.log & echo $! > /tmp/tpu_queue.pid
LOG=${1:-/tmp/tpu_queue.log}
cd "$(dirname "$0")/.."
exec >>"$LOG" 2>&1
. scripts/tpu_lock.sh
rm -f /tmp/tpu_queue.done

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

echo "=== tpu_queue start $(date) ==="
until with_lock probe; do
  echo "tpu down $(date)"
  sleep 180
done

echo "=== TPU back $(date): microbench_svd ==="
with_lock timeout -k 30 3600 python scripts/microbench_svd.py || echo "MICROBENCH FAILED rc=$?"

echo "=== tpu_parity_check --trunc svd --svd-impl pjsvd $(date) ==="
TNQS_SVD_IMPL=pjsvd with_lock timeout -k 30 5400 python scripts/tpu_parity_check.py \
  --trunc svd --svd-impl pjsvd \
  --out tests/golden/tpu_parity_chi64_pjsvd.json || echo "PARITY FAILED rc=$?"

touch /tmp/tpu_queue.done
echo "=== tpu_queue done $(date) ==="
