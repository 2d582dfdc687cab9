#!/bin/bash
# Execute the TPU work queue (benchmarks/TPU_WORK_QUEUE.md) sequentially,
# one TPU client at a time, logging everything to benchmarks/chip_logs/.
# Decision points (flipping defaults) stay manual — this only measures.
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/chip_logs
log() { echo "[queue $(date +%T)] $*"; }

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 t=$2; shift 2
    log "START $name"
    timeout "$t" "$@" > "benchmarks/chip_logs/$name.log" 2>&1
    local rc=$?
    log "END $name rc=$rc (tail follows)"
    tail -5 "benchmarks/chip_logs/$name.log"
    return 0
}

# 0. Tiny probe: is the tunnel alive at all?
log "probe"
if ! timeout 120 python -c "import jax, jax.numpy as j; print(float(j.ones(8).sum()))"; then
    log "TPU probe FAILED - tunnel still wedged; aborting"
    exit 1
fi

run stem_fp_ab        1500 python benchmarks/stem_fp_ab.py
run input_layout_ab   1200 python benchmarks/input_layout_ab.py
run packsort_ab       1200 python benchmarks/packsort_ab.py
run profile_ssd300    900  python benchmarks/profile_int8.py ssd300_infer_bs64 40
run profile_ssd512    1200 python benchmarks/profile_int8.py ssd512_resnet50_coco 40
log "queue done - see benchmarks/chip_logs/"
