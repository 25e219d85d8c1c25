#!/bin/bash
# The TPU-native flagship mode: single-program pipelined ANCE.
#
# Replaces the reference's two cooperating jobs (commands/run_train.sh +
# commands/run_ann_data_gen.sh polling each other through the filesystem)
# with ONE program on one mesh: every generator stage — corpus re-encode,
# dev eval, mining — runs as bounded work items interleaved between train
# steps, and corpus embeddings refresh in place in HBM
# (ance_tpu/train/pipelined.py). Restarts resume from the newest complete
# checkpoint automatically.
#
# Expects preprocessed caches in $OUT_DATA_DIR (see run_train.sh step 1).
set -euo pipefail

OUT_DATA_DIR=${OUT_DATA_DIR:-preprocessed_data}
CKPT_DIR=${CKPT_DIR:-checkpoints_pipelined}
WARMUP_CKPT=${WARMUP_CKPT:-}      # BM25 warmup checkpoint to warm-start from

# ---- FirstP passage preset (paper settings; reference run_train.sh:25-40) --
MODEL_TYPE=${MODEL_TYPE:-rdot_nll}
SEQ_LEN=${SEQ_LEN:-128}
QUERY_LEN=${QUERY_LEN:-64}
LR=${LR:-1e-6}
TOPK=${TOPK:-200}
NEG=${NEG:-20}
MAX_STEPS=${MAX_STEPS:-600000}

# staleness/throughput knobs (SURVEY.md §7.3): one work item runs every
# TRAIN_STEPS_PER_SLICE train steps; smaller = fresher negatives, more
# encode interleave overhead
TRAIN_STEPS_PER_SLICE=${TRAIN_STEPS_PER_SLICE:-8}
ENCODE_SLICE=${ENCODE_SLICE:-65536}

python -m ance_tpu.cli ance-loop \
    --model_type "$MODEL_TYPE" \
    ${WARMUP_CKPT:+--model_name_or_path "$WARMUP_CKPT"} \
    --data_dir "$OUT_DATA_DIR" --output_dir "$CKPT_DIR" \
    --max_seq_length "$SEQ_LEN" --max_query_length "$QUERY_LEN" \
    --learning_rate "$LR" --optimizer lamb \
    --max_steps "$MAX_STEPS" \
    --topk_training "$TOPK" --negative_sample "$NEG" \
    --train_steps_per_slice "$TRAIN_STEPS_PER_SLICE" \
    --encode_slice_size "$ENCODE_SLICE" \
    --log_trust_ratios
