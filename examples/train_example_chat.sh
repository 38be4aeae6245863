#!/bin/bash
# Debug SFT smoke run (the reference's scripts/train_example_chat.sh
# equivalent): tiny random model, data-derived tokenizer, 1 chip or CPU.
cd "$(dirname "$0")/.." || exit 1
python -m mantis_tpu.train.train_mllava \
    --init_random \
    --data_config_path examples/data_config_example.yaml \
    --output_dir /tmp/mantis_tpu_example_chat \
    --batch_size 2 \
    --max_steps "${MAX_STEPS:-20}" \
    --max_seq_len 512 \
    --learning_rate 1e-3 \
    --compute_dtype float32 \
    --save_steps 10 \
    "$@"
