#!/bin/bash
# Hardware work queue for when the TPU tunnel returns. Runs each pending
# item from the round-2 hardware list in order, logging to
# benchmarks/hw_checklist_<ts>/. Each step is independently timed-out so
# a hung tunnel doesn't wedge the whole list.
#
# Usage: bash scripts/hw_checklist.sh [--skip-large]
set -u
cd "$(dirname "$0")/.."
TS=$(date +%Y%m%d_%H%M%S)
OUT=benchmarks/hw_checklist_$TS
mkdir -p "$OUT"
echo "logging to $OUT"

run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  echo "exit $? — tail:"; tail -5 "$OUT/$name.log"
}

# 0. probe
run probe 60 python -c "import jax; print(jax.devices())"
grep -qi tpu "$OUT/probe.log" || { echo "tunnel still down; aborting"; exit 1; }

# 1. full bench (cold cache can take ~200 s compile; give it room)
run bench 1800 python bench.py

# 2. Pallas lin-phase A/B (record number in PERF.md afterwards)
run ab_pallas_lin 1800 python scripts/ab_pallas_lin.py

# 2b. shape-driven specializations beyond Snavely: SE3 pose-graph
#     linearize kernel + FoE CGNR J^T(Jv) kernel
run ab_pallas_shapes 2400 python scripts/ab_pallas_shapes.py

# 3. large BA scaling (1024 cam / 200k pts / 1M obs) — now routes to
#    fused implicit; was 2.8 s/LM-iter via the host-loop fallback
if [ "${1:-}" != "--skip-large" ]; then
  run ba_scaling_large 3600 python -m benchmarks.ba_scaling_benchmark --large
fi

# 4. TPU smoke tier (incl. new sparse-schur, batch, implicit tests)
run tests_tpu 3600 python -m pytest tests_tpu/ -q

# 5. mixed-iteration-gap isolation on the device: (a) f64 downstream —
#    if STILL 9 iters, f32 jacfwd entries are the cause (park it); if 7,
#    run (b) to split megakernel vs XLA contraction arithmetic.
run gap_f64 1200 python scripts/exp_precision.py f64 tpu
run gap_mixed 1200 python scripts/exp_precision.py mixed tpu
run gap_f64acc 1200 python scripts/exp_precision.py f64acc tpu
run gap_no_pallas_lin 1200 env CERES_TPU_NO_PALLAS_LIN=1 python scripts/exp_precision.py mixed tpu

echo "=== done; summaries ==="
for f in "$OUT"/*.log; do echo "--- $f"; tail -3 "$f"; done
