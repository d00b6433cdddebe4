#!/bin/bash
# Wait for the tunneled TPU to come back, then run the round-3 pjsvd
# validation chain sequentially (ONE TPU process at a time — concurrent
# axon processes wedge the chip; see CLAUDE.md).
#
#   1. scripts/microbench_svd.py            — pjsvd vs XLA SVD speed/accuracy
#   2. scripts/tpu_parity_check.py (pjsvd)  — 10-layer chi=64 Eagle trajectory
#
# Usage:  bash scripts/tpu_queue.sh /tmp/tpu_queue.log & echo $! > /tmp/tpu_queue.pid
LOG=${1:-/tmp/tpu_queue.log}
cd "$(dirname "$0")/.."
exec >>"$LOG" 2>&1

probe() {
  timeout 150 python -c "
import jax, numpy as np, jax.numpy as jnp
d = jax.devices()
x = jnp.ones((128, 128), jnp.float32)
v = float(np.asarray((x @ x).sum().reshape(1, 1))[0, 0])
assert v == 128.0 * 128.0 * 128.0, v
print('TPU OK:', d)
"
}

echo "=== tpu_queue start $(date) ==="
until probe; do
  echo "tpu down $(date)"
  sleep 180
done

echo "=== TPU back $(date): microbench_svd ==="
timeout 3600 python scripts/microbench_svd.py || echo "MICROBENCH FAILED rc=$?"

echo "=== tpu_parity_check --trunc svd --svd-impl pjsvd $(date) ==="
TNQS_SVD_IMPL=pjsvd timeout 5400 python scripts/tpu_parity_check.py \
  --trunc svd --svd-impl pjsvd \
  --out tests/golden/tpu_parity_chi64_pjsvd.json || echo "PARITY FAILED rc=$?"

echo "=== tpu_queue done $(date) ==="
