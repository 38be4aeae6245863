#!/bin/bash
# Stage-1 projector pretrain (the reference's scripts/pretrain_mllava.sh):
# train the MLP projector only, lr 1e-3, on caption data.
set -e
cd "$(dirname "$0")/.."
MODEL=${MODEL:?set MODEL=/path/to/composed/base}
DATA=${DATA:?set DATA=/path/to/llava_pretrain.yaml}
OUT=${OUT:-/tmp/mantis_tpu_pretrain}
python -m mantis_tpu.train.train_mllava \
    --model_path "$MODEL" \
    --data_config_path "$DATA" \
    --output_dir "$OUT" \
    --do_pretrain \
    --max_seq_len 2048 \
    --batch_size "${GLOBAL_BATCH:-256}" \
    --num_epochs 1 \
    "$@"
