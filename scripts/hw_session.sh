#!/bin/bash
# One-shot TPU measurement session for round 3 — run the moment the axon
# tunnel is back (tail /tmp/tpu_probe.log for "TPU BACK"). Ordered so the
# most decision-relevant numbers land first if the tunnel dies mid-session.
# Usage:  bash scripts/hw_session.sh [outdir]   (default /tmp/hw_r3)
set -u
OUT=${1:-/tmp/hw_r3}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # run NAME TIMEOUT CMD...
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/session.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "rc=$rc" >> "$OUT/$name.log"
  tail -25 "$OUT/$name.log" | tee -a "$OUT/session.log"
  return $rc
}

# 0. liveness (fail the whole session in 2 min if the tunnel is dead)
run probe 120 python -c "import jax, jax.numpy as jnp; assert jax.devices()[0].platform != 'cpu'; print(float(jnp.ones((8,128)).sum()), jax.devices()[0].platform)" || exit 1

# 1. the star-machinery decision set (row-bands x group x k0 x ovf_split x chunk)
run sweep_decide 1500 python -u scripts/sweep_star_machinery.py --decide

# 2. stage breakdown at the apparent winner (edit flags after reading #1)
run profile_stages 900 python -u scripts/profile_star_stages.py

# 3. adjoint: store_stages + tile sweep (VERDICT r2 #4)
run sweep_adjoint 1500 python -u scripts/sweep_adjoint.py

# 4. the full k0 axis if time permits
run sweep_k0 2400 python -u scripts/sweep_star_machinery.py --k0-sweep

# 5. bench with current defaults (re-run manually after flipping winners)
run bench 1500 python bench.py

echo "session done: $OUT"
