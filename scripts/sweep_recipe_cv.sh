#!/bin/bash
# Recipe-lever sweep gated on pooled leave-banks-out CV (VERDICT r3 #1).
#
# Each arm = a full 8-fold scripts/cv_generalization.py run of the
# dx_1024_best recipe with ONE lever changed from the baseline
# (runs/cv_generalization.jsonl: pooled topology-exact 20.6%, param-acc
# 37.5% at the inherited torch-parity weight_decay=0.01, no dropout, no
# augmentation).  Ship gate: pooled held.topology_exact >= 0.24 (one
# fold-sigma above baseline); otherwise the arm is a documented negative.
#
# Runs arms SEQUENTIALLY (one TPU process at a time, CLAUDE.md).
# Usage: nohup bash scripts/sweep_recipe_cv.sh > /tmp/sweep_cv.log 2>&1 &
set -e
cd "$(dirname "$0")/.."

run () {
  echo "=== $(date +%H:%M:%S) arm: $* ==="
  python scripts/cv_generalization.py "$@"
}

run --weight-decay 0.1  --out runs/cv_wd10.jsonl
run --dropout 0.1       --out runs/cv_drop10.jsonl
run --jitter 1.0        --out runs/cv_jitter100.jsonl
run --weight-decay 0.03 --out runs/cv_wd03.jsonl
run --weight-decay 0.0  --out runs/cv_wd00.jsonl
echo "=== $(date +%H:%M:%S) sweep complete ==="
