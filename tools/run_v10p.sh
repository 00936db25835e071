#!/bin/sh
# Round-4 flagship candidate: v9p recipe + capacity bump.
#
# Rationale (round-4 diagnostics): v9p's final train ranking accuracy
# plateaued at 0.652 — the (32, 14) CNN UNDERFITS its training
# batches — while param-norm checks show no weight collapse, so the
# binding constraint is capacity, not the schedule.  (48, 30) raises
# learned channels 14 -> 30 (C = 32 total with the 2 prior channels);
# the eval-time cost is absorbed by the licensed rank-3 coupling fold
# (ligand-side channels project to r before correlation).  Val
# selection widens 32 -> 48 complexes (seeds 50-97, still disjoint
# from the report band 100-147) to cut selection noise ~sqrt(1.5)x.
set -e
cd "$(dirname "$0")/.."
STEPS=${1:-2000}
OUT=${2:-pretrained/synthetic-v10p}
TF_GRID=64 TF_SEEDS=1024 TF_LR=8e-5 TF_EMA=0.998 \
TF_GLOBAL_FRAC=0.5 TF_NEAR_NATIVE=5.0 TF_MINE_EVERY=40 \
TF_BACKBONE=1 TF_UNBOUND=1.2 TF_VAL_COMPLEXES=48 \
TF_FEATURES=48,30 \
exec python tools/train_flagship.py "$STEPS" "$OUT"
