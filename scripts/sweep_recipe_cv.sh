#!/bin/bash
# Recipe-lever sweep gated on pooled leave-banks-out CV (VERDICT r3 #1).
#
# Each arm = a scripts/cv_generalization.py run of the dx_1024_best recipe
# with ONE lever changed from the baseline (runs/cv_generalization.jsonl:
# pooled topology-exact 20.6%, param-acc 37.5% at the inherited
# torch-parity weight_decay=0.01, no dropout, no augmentation).
#
# Two-stage protocol (full 8-fold x 5 arms is ~3.5 h of TPU; screening
# keeps the same fold definitions so numbers stay comparable):
#   1. screening: FOLD_END=2 scores folds 0-1 only (256 held patches,
#      sigma ~2.5 pts).  Baseline on the same folds: topology-exact
#      0.1914 (0.2109, 0.1719), param-acc 0.3814.
#   2. any arm >= 0.24 pooled topology-exact on the screen is extended
#      with --fold-start 2 (appending to the same --out) toward the full
#      8-fold ship gate: pooled held.topology_exact >= 0.24.
# Arms below the screen bar are documented negatives (docs/PERF.md).
#
# Runs arms SEQUENTIALLY (one TPU process at a time, CLAUDE.md).
# Usage: nohup bash scripts/sweep_recipe_cv.sh > /tmp/sweep_cv.log 2>&1 &
#        FOLD_END=8 ... for the full run of a winning arm.
set -e
cd "$(dirname "$0")/.."
FOLD_END=${FOLD_END:-2}

run () {
  echo "=== $(date +%H:%M:%S) arm: $* (folds 0..$FOLD_END) ==="
  python scripts/cv_generalization.py --fold-end "$FOLD_END" "$@"
}

run --weight-decay 0.1  --out runs/cv_wd10.jsonl
run --dropout 0.1       --out runs/cv_drop10.jsonl
run --jitter 1.0        --out runs/cv_jitter100.jsonl
run --weight-decay 0.0  --out runs/cv_wd00.jsonl
echo "=== $(date +%H:%M:%S) sweep complete ==="
