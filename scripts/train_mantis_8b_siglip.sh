#!/bin/bash
# Full Mantis-8B-SigLIP-LLaMA3 SFT recipe (reference:
# mantis/train/scripts/train_mllava.sh:42-47,135-180):
#   max_seq_len 8192, GLOBAL batch 128, per-device 1, lr 1e-5 cosine,
#   warmup 3%, weight decay 0, 1 epoch, bf16, gradient checkpointing,
#   FSDP sharding (ZeRO-3 equivalent).
# Global-batch arithmetic mirrors the reference launcher:
#   gradient_accumulation_steps = GLOBAL_BATCH / (PER_DEVICE * N_CHIPS)
# remat 'dots' saves matmul outputs (+7% MFU, docs/PERF.md "Remat
# policy"); ~38 GB activations/chip at these widths fits v5p (95 GB) —
# set REMAT_POLICY=nothing on smaller-HBM chips.
set -e

MODEL_PATH=${MODEL_PATH:-"checkpoints/mantis-8b-siglip-llama3-pretrain"}
OUTPUT_DIR=${OUTPUT_DIR:-"checkpoints/mantis-8b-siglip-llama3-sft"}
DATA_CONFIG=${DATA_CONFIG:-"configs/mantis_instruct.yaml"}

GLOBAL_BATCH=${GLOBAL_BATCH:-128}
PER_DEVICE_BATCH=${PER_DEVICE_BATCH:-1}
N_CHIPS=${N_CHIPS:-$(python -c 'import jax; print(len(jax.devices()))')}
BATCH_SIZE=$((PER_DEVICE_BATCH * N_CHIPS))
GRAD_ACCUM=$((GLOBAL_BATCH / BATCH_SIZE))
echo "chips=$N_CHIPS per_device=$PER_DEVICE_BATCH batch=$BATCH_SIZE accum=$GRAD_ACCUM (global $GLOBAL_BATCH)"

python -m mantis_tpu.train.train_mllava \
  --model_path "$MODEL_PATH" \
  --data_config_path "$DATA_CONFIG" \
  --output_dir "$OUTPUT_DIR" \
  --conv_template llama_3 \
  --max_seq_len 8192 \
  ${NOPACK:+ } ${NOPACK:---packing} \
  --batch_size "$BATCH_SIZE" \
  --gradient_accumulation_steps "$GRAD_ACCUM" \
  --learning_rate 1e-5 \
  --lr_schedule cosine \
  --warmup_ratio 0.03 \
  --weight_decay 0.0 \
  --num_epochs 1 \
  --compute_dtype bfloat16 \
  --remat_policy "${REMAT_POLICY:-dots}" \
  --mesh_fsdp "$N_CHIPS" --mesh_data 1 \
  "$@"
