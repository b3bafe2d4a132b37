#!/usr/bin/env bash
# The paper's headline pipeline (reference README.md:36-43):
#   1. train a LightGCN base model
#   2. train the TextGCN LTR head warm-started from it (--load_base --freeze)
#   3. export serving artifacts (propagated tables + collapsed head factors)
#
# Self-contained: generates a small clustered synthetic dataset with text
# (meta_synced.tsv + reviews_text.tsv) so no external data is needed.
set -euo pipefail
cd "$(dirname "$0")/.."

export TEXTGCN_TPU_PLATFORM="${TEXTGCN_TPU_PLATFORM:-cpu}"
export TEXTGCN_TPU_TEXT_ENCODER="${TEXTGCN_TPU_TEXT_ENCODER:-stub}"

DATA=${DATA:-/tmp/textgcn_example_data}
RUNS=runs/$(basename "$DATA")

if [ ! -f "$DATA/train.tsv" ]; then
  python tools/make_synthetic.py "$DATA" 1200 500 0
fi

echo "== 1/3: LightGCN base model =="
python -m textgcn_tpu --model lgcn --data "$DATA" \
  --epochs 60 --evaluate_every 20 --lr 5e-3 --uid base

echo "== 2/3: LTR head warm-started from the base (frozen tables) =="
python -m textgcn_tpu --model ltr_linear --data "$DATA" \
  --load_base "$RUNS/base" --freeze \
  --epochs 40 --evaluate_every 20 --lr 5e-3 --uid ltr

echo "== 3/3: serving export + predictions =="
python -m textgcn_tpu --model ltr_linear --data "$DATA" \
  --load "$RUNS/ltr" --no_train --predict --export_reprs --uid ltr_export

echo "Artifacts:"
ls "$RUNS/base" "$RUNS/ltr" "$RUNS/ltr_export"
