#!/bin/bash
# Chip-gated measurement queue (round 5 edition). Run on the DEFAULT
# env (axon TPU backend) once the tunnel is up; each stage logs to
# $OUT and prints its tail.
#
#   bash tools/chip_queue.sh [outdir]
#
# Order matters: bench.py first (regression check gates everything
# else — both the worst-case primary and the trained-regime line),
# then the anchor reproduction on the chip, then the standing A/Bs
# (all currently measured-REJECTED; re-run to re-verify on new
# hardware/XLA versions — see DESIGN.md for each verdict).
set -u
OUT=${1:-/tmp/chip_r5}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
    local name=$1 t=$2
    shift 2
    echo "=== $name: $* (start $(date -u +%H:%M:%S), timeout ${t}s)"
    timeout "$t" "$@" > "$OUT/$name.log" 2>&1
    echo "--- rc=$? (end $(date -u +%H:%M:%S)); tail:"
    tail -6 "$OUT/$name.log"
    echo
}

# bench.py's internal outage watchdog (init wait 300 + total budget
# 2400 = bounded 2700) must fire BEFORE the external timeout (3000),
# or a mid-run tunnel drop reproduces the r3 rc=124/no-output shape
# with an empty bench.log instead of the labeled JSON failure record.
BENCH_ENV="env ISC_BENCH_INIT_WAIT_S=300 ISC_BENCH_TOTAL_BUDGET_S=2400"

run bench              3000 $BENCH_ENV python bench.py
# full 7-stage pipeline trained on the chip + compared to ANCHOR.json
# (f32 and bf16 serving policy); ~40 min of mostly tunnel latency
run anchor_tpu         7200 python tools/anchor_tpu.py \
                            --workdir "$OUT/anchor_tree"
run ab_attention       3000 python tools/ab_attention.py
run ablate_serving     3500 python tools/ablate_serving.py
run profile_encoder    2400 python tools/profile_encoder.py both
run bench_daemon_image 1800 python tools/bench_daemon.py image
run bench_train        3600 python tools/bench_train.py
