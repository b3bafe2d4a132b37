#!/usr/bin/env bash
# Production-scale training recipe: the throughput levers from SCALE.md
# composed into one run, on a locally generated 20k x 8k synthetic graph
# (sized so the example finishes quickly; the same flags ran the 200k x 80k
# / 2.1M-edge run in RESULTS.md).
#
#   --mesh            shard tables/edges/batch over all visible devices
#   --steps_per_call  bound each jitted device call (required through
#                     remote TPU relays; identical math/RNG)
#   --refresh_every 8 cached propagation: ~10-12x step time at scale for
#                     ~1% quality (approximate gradients; opt-in)
#   --approx_topk     serving-mode eval retrieval (approx_max_k + bf16
#                     scores; exact training untouched)
#   --resume          crash-resume: params + opt state + RNG + epoch +
#                     metrics; continuation is bitwise-identical
set -euo pipefail
cd "$(dirname "$0")/.."

export TEXTGCN_TPU_PLATFORM="${TEXTGCN_TPU_PLATFORM:-cpu}"
export TEXTGCN_TPU_TEXT_ENCODER="${TEXTGCN_TPU_TEXT_ENCODER:-stub}"

DATA=${DATA:-/tmp/textgcn_prod_data}
RUNS=runs/$(basename "$DATA")

if [ ! -f "$DATA/train.tsv" ]; then
  python tools/make_synthetic.py "$DATA" 20000 8000 0
fi

python -m textgcn_tpu --model lgcn --data "$DATA" \
  --epochs 30 --evaluate_every 10 --lr 5e-3 \
  --mesh auto --steps_per_call 64 --refresh_every 8 \
  --approx_topk 0.95 --uid prod

# simulate picking the run back up after an interruption: one more epoch
python -m textgcn_tpu --model lgcn --data "$DATA" \
  --epochs 31 --evaluate_every 10 --lr 5e-3 \
  --mesh auto --steps_per_call 64 --refresh_every 8 \
  --approx_topk 0.95 --resume "$RUNS/prod" --uid prod
