#!/bin/bash
# ANN data generator job (two-job compat mode): polls the trainer's
# checkpoint dir, re-encodes the corpus, refreshes the index, mines
# negatives (reference commands/run_ann_data_gen.sh).
set -euo pipefail

OUT_DATA_DIR=${OUT_DATA_DIR:-preprocessed_data}
ANN_DIR=${ANN_DIR:-ann_data}
CKPT_DIR=${CKPT_DIR:-checkpoints}
MODEL_TYPE=${MODEL_TYPE:-rdot_nll}
SEQ_LEN=${SEQ_LEN:-128}
QUERY_LEN=${QUERY_LEN:-64}

while true; do
  python -m ance_tpu.cli generate \
      --model_type "$MODEL_TYPE" --data_dir "$OUT_DATA_DIR" \
      --training_dir "$CKPT_DIR" --output_dir "$ANN_DIR" \
      --topk_training "${TOPK:-200}" --negative_sample "${NEG:-20}" \
      --max_seq_length "$SEQ_LEN" --max_query_length "$QUERY_LEN" --bf16
  sleep 60   # reference poll cadence (run_ann_data_gen.py:684-685)
done
