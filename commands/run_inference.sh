#!/bin/bash
# Inference-only job (reference commands/run_inference.sh): encode the corpus
# + dev queries with a released/trained checkpoint, stop after the encode
# (reference --inference, run_ann_data_gen.py:256-257), and dump the
# embedding shards the offline eval consumes (`ance eval-full`).
#
# Experiment presets mirror the reference header blocks:
#   Passage FirstP: MODEL_TYPE=rdot_nll             SEQ_LEN=512
#   Doc FirstP:     MODEL_TYPE=rdot_nll             SEQ_LEN=512 (doc caches)
#   Doc MaxP:       MODEL_TYPE=rdot_nll_multi_chunk SEQ_LEN=2048
set -euo pipefail

OUT_DATA_DIR=${OUT_DATA_DIR:-preprocessed_data}
EMB_DIR=${EMB_DIR:-emb_dump}
CKPT_DIR=${CKPT_DIR:-checkpoints}
INIT_MODEL_DIR=${INIT_MODEL_DIR:-}   # released ANCE checkpoint dir
MODEL_TYPE=${MODEL_TYPE:-rdot_nll}
SEQ_LEN=${SEQ_LEN:-512}
QUERY_LEN=${QUERY_LEN:-64}

extra=()
[ -n "$INIT_MODEL_DIR" ] && extra+=(--init_model_dir "$INIT_MODEL_DIR")

python -m ance_tpu.cli infer \
    --model_type "$MODEL_TYPE" --data_dir "$OUT_DATA_DIR" \
    --training_dir "$CKPT_DIR" --output_dir "$EMB_DIR" \
    --per_device_eval_batch_size "${EVAL_BATCH:-128}" \
    --max_seq_length "$SEQ_LEN" --max_query_length "$QUERY_LEN" \
    --bf16 "${extra[@]}"

echo "embedding shards in $EMB_DIR; score with:"
echo "  python -m ance_tpu.cli eval-full --query_prefix $EMB_DIR/step0_dev_query_emb_p_ ..."
