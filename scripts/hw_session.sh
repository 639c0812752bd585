#!/bin/bash
# One-shot TPU measurement session for round 5 — run the moment the axon
# tunnel is back. ORDERED BY VALUE-IF-THE-TUNNEL-DIES-MID-SESSION: the
# round-4 bench of record was lost to a dead tunnel (BENCH_r04 rc=1), so
# the official bench number is banked FIRST, correctness revalidation
# second, diagnostics after.
# Usage:  bash scripts/hw_session.sh [outdir]   (default /tmp/hw_r5)
set -u
OUT=${1:-/tmp/hw_r5}
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

# 1. the official metric — bank it before anything else
run bench 2400 python bench.py

# 1b. Mosaic capability probe: in-kernel dynamic_gather + range DMA (the
#     mechanism DESIGN.md §3's star-stage ceiling says is missing; jax 0.9
#     lowers take_along_axis to tpu.dynamic_gather — does it COMPILE+RUN
#     for R >> 8 on v5e, and at what ns/row?)
run probe_gather 900 python -u scripts/probe_dynamic_gather.py

# 1c. the assembled pass-1 prototype (window DMA + in-VMEM row select +
#     slot math) at production scale — the true go/no-go number
run proto 1200 python -u scripts/proto_window_kernel.py

# 2. all 9 scenes, Pallas vs XLA on the chip (r5 revalidation)
run scenes_check 1800 python -u scripts/scenes_check.py

# 3. star-stage profile (confirm the r4 38.2 ms state under r5 code)
run profile_stages 900 python -u scripts/profile_star_stages.py

# 4. differentiable full pipeline (the r4 flagship measurement, re-run)
run bench_diff 1500 python -u scripts/bench_diff_pipeline.py

# 5. heavy workloads (default-aa 4x supersample + 8K)
run bench_heavy 1800 python -u scripts/bench_heavy.py

echo "session done: $OUT"
