#!/bin/bash
# Multi-host SFT launcher (the torchrun/SLURM env plumbing equivalent,
# reference: mantis/train/train_utils.py:466-545 + scripts SLURM logic).
#
# On TPU pods the runtime sets the coordinator automatically
# (jax.distributed.initialize() with no args); elsewhere export:
#   COORDINATOR_ADDRESS=host:port  NUM_PROCESSES=N  PROCESS_ID=i
# Each host runs this script; the input pipeline shards itself via
# DistributedDataLoader (jax.process_index/process_count) and pjit
# assembles global arrays.
set -e

export JAX_COORDINATOR_ADDRESS=${COORDINATOR_ADDRESS:-}
export JAX_NUM_PROCESSES=${NUM_PROCESSES:-}
export JAX_PROCESS_ID=${PROCESS_ID:-}

GLOBAL_BATCH=${GLOBAL_BATCH:-128}
PER_DEVICE_BATCH=${PER_DEVICE_BATCH:-1}

python - <<'PY'
import jax
# no-arg initialize works on TPU pods; env-driven elsewhere
try:
    jax.distributed.initialize()
except Exception as e:  # single-host fallback
    print(f"jax.distributed.initialize skipped: {e}")
print(f"process {jax.process_index()}/{jax.process_count()}, "
      f"{jax.local_device_count()} local / {jax.device_count()} global "
      "devices")
PY

N_CHIPS=$(python -c 'import jax; print(len(jax.devices()))')
BATCH=$((PER_DEVICE_BATCH * N_CHIPS))
GRAD_ACCUM=$((GLOBAL_BATCH / BATCH))

exec python -m mantis_tpu.train.train_mllava \
  --model_path "${MODEL_PATH:?}" \
  --data_config_path "${DATA_CONFIG:-configs/mantis_instruct.yaml}" \
  --output_dir "${OUTPUT_DIR:?}" \
  --batch_size "$BATCH" \
  --gradient_accumulation_steps "$GRAD_ACCUM" \
  --mesh_fsdp "$N_CHIPS" --mesh_data 1 \
  --max_seq_len 8192 --packing --compute_dtype bfloat16 "$@"
