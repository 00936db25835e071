#!/bin/sh
# Round-3 held-out report: 48 polymer-backbone unbound complexes
# (seeds 100-147 — the report band; never used for tuning/selection).
#
# Columns:
#   eval_matrix_48.json        main matrix: shape vs learned, global +
#                              local protocols, + two-stage rerank row
#   eval_matrix_48_rank2.json  coupling_rank=2 truncation (licenses the
#                              rank-truncated bench default)
#   eval_matrix_48_fp32.json   float32 sweep (licenses the bf16
#                              headline dtype; round-2 VERDICT weak #7)
#
# Usage: sh tools/run_heldout_matrix.sh [ckpt_dir]  (default v9p best)
set -e
CKPT=${1:-pretrained/synthetic-v9p/best}
OUT=$(dirname "$CKPT")

base="EM_BACKBONE=1 EM_UNBOUND=1.2 EM_WIDEN=1 EM_COMPLEXES=48 \
EM_SEED0=100 EM_NROT=1536 EM_GRID=64"

# eval_matrix.py checkpoints per row and resumes from its output file,
# so a TPU worker crash (observed round 4) costs one row, not the run:
# retry each column up to 3 times.
run_col() {
    for attempt in 1 2 3; do
        if env $base "$@"; then return 0; fi
        echo "column failed (attempt $attempt), retrying..." >&2
        sleep 30
    done
    return 1
}

run_col EM_RERANK=1 \
    python tools/eval_matrix.py "$CKPT" "$OUT/eval_matrix_48.json"
run_col EM_MODES=global EM_RANK=2 \
    python tools/eval_matrix.py "$CKPT" "$OUT/eval_matrix_48_rank2.json"
run_col EM_MODES=global EM_DTYPE=float32 \
    python tools/eval_matrix.py "$CKPT" "$OUT/eval_matrix_48_fp32.json"
