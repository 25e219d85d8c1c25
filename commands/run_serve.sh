#!/bin/bash
# Online serving preset: load (or build) the exact index and serve over HTTP.
#
# The reference has no serving driver — its ~100x cascade-speedup claim
# (reference README.md:16-17) is exactly this deployment shape: frozen
# encoder + exact IP index answering query batches. Presets:
#   saved index (production restart): SAVED_INDEX=idx  → instant start,
#     int8 stays int8 on disk, ids already in real pid space
#   fresh build: DATA_DIR=preprocessed_data → encodes {DATA_DIR}/passages
#     with the newest checkpoint under CKPT_DIR (QUANTIZE=dims for the
#     8.8M-on-one-core int8 format, DESIGN.md §4.1)
set -euo pipefail

CKPT_DIR=${CKPT_DIR:-checkpoints}
MODEL_TYPE=${MODEL_TYPE:-rdot_nll}
MODEL_NAME=${MODEL_NAME:-roberta-base}
HTTP_ADDR=${HTTP_ADDR:-0.0.0.0:8080}
TOPK=${TOPK:-10}
SAVED_INDEX=${SAVED_INDEX:-}
DATA_DIR=${DATA_DIR:-}
QUANTIZE=${QUANTIZE:-none}

if [[ -n "$SAVED_INDEX" ]]; then
  exec python -m ance_tpu.cli serve \
    --model_type "$MODEL_TYPE" --model_name_or_path "$MODEL_NAME" \
    --training_dir "$CKPT_DIR" --load_index "$SAVED_INDEX" \
    --http "$HTTP_ADDR" --topk "$TOPK" --bf16
fi

[[ -n "$DATA_DIR" ]] || { echo "set SAVED_INDEX or DATA_DIR" >&2; exit 2; }
exec python -m ance_tpu.cli serve \
  --model_type "$MODEL_TYPE" --model_name_or_path "$MODEL_NAME" \
  --training_dir "$CKPT_DIR" --data_dir "$DATA_DIR" \
  --quantize "$QUANTIZE" --save_index "${SAVE_INDEX:-serving_index}" \
  --http "$HTTP_ADDR" --topk "$TOPK" --bf16
