#!/bin/bash
# Flagship SFT recipe (the reference's scripts/train_mllava.sh on TPU):
# seq 8192, global batch 128, lr 1e-5 cosine, warmup 3%, wd 0, 1 epoch,
# bf16 compute, remat, FSDP over the full slice.
set -e
cd "$(dirname "$0")/.."
MODEL=${MODEL:?set MODEL=/path/to/Mantis-8B-siglip-llama3}
DATA=${DATA:?set DATA=/path/to/mantis_instruct.yaml}
OUT=${OUT:-/tmp/mantis_tpu_sft}
NCHIPS=$(python -c "import jax; print(len(jax.devices()))")
python -m mantis_tpu.train.train_mllava \
    --model_path "$MODEL" \
    --data_config_path "$DATA" \
    --output_dir "$OUT" \
    --max_seq_len 8192 \
    --batch_size "${GLOBAL_BATCH:-128}" \
    --learning_rate 1e-5 --lr_schedule cosine --warmup_ratio 0.03 \
    --weight_decay 0.0 --num_epochs 1 \
    --compute_dtype bfloat16 \
    --mesh_fsdp "$NCHIPS" --mesh_data 1 \
    --save_steps 500 --save_total_limit 1 \
    "$@"
