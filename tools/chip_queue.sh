#!/bin/bash
# Round-4 chip-gated measurement queue (DESIGN.md "Round-4 summary" —
# PENDING list). Run on the DEFAULT env (axon TPU backend) once the
# tunnel is up; each stage logs to $OUT and prints its tail.
#
#   bash tools/chip_queue.sh [outdir]
#
# Order matters: bench.py first (BENCH_r04 regression check gates
# everything else), then the queued A/Bs and profiles.
set -u
OUT=${1:-/tmp/chip_r4}
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
run ab_scan_unroll     2400 python tools/ab_scan_unroll.py
run profile_encoder    2400 python tools/profile_encoder.py both
run ablate_encoder     1800 python tools/ablate_encoder.py
run ablate_serving     3500 python tools/ablate_serving.py
run ab_maxpool         2400 python tools/ab_maxpool.py --variants pallas
run bench_daemon_image 1800 python tools/bench_daemon.py image
run ablate_train       7200 python tools/ablate_train.py --step both
run ab_ciderd_merge    3600 python tools/ab_ciderd_merge.py
run ab_rl_detector     3600 python tools/ab_rl_detector.py
run bench_calibrated   3000 $BENCH_ENV env ISC_BENCH_CALIBRATED=1 python bench.py
run soak_daemon        1500 python tools/soak_daemon.py

echo "all stage logs in $OUT"
