#!/bin/bash
# Debug classification smoke run (the reference's
# scripts/train_example_classification.sh equivalent): qwen2_vl
# sequence-classification head on the example label dicts.
cd "$(dirname "$0")/.." || exit 1
python -m mantis_tpu.train.train \
    --arch "${ARCH:-qwen2_vl}" \
    --init_random \
    --problem_type "${PROBLEM_TYPE:-multi_label_classification}" \
    --data_path examples/data/classification/train.json \
    --output_dir /tmp/mantis_tpu_example_classification \
    --batch_size 2 \
    --max_steps "${MAX_STEPS:-20}" \
    --max_seq_len 512 \
    --learning_rate 1e-3 \
    --compute_dtype float32 \
    --save_steps 10 \
    "$@"
