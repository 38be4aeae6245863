#!/bin/bash
# Debug chat-video smoke run (the reference's
# scripts/train_example_chat_video.sh equivalent).  Default trains
# videollava through the video encoder (<video> token path); set
# ARCH=mllava USE_VE= for frames-as-images.
cd "$(dirname "$0")/.." || exit 1
python -m mantis_tpu.train.train \
    --arch "${ARCH:-videollava}" \
    --init_random \
    ${USE_VE---use_video_encoder} \
    --num_frames 2 \
    --data_path examples/data/chat_video/train.json \
    --output_dir /tmp/mantis_tpu_example_chat_video \
    --batch_size 2 \
    --max_steps "${MAX_STEPS:-20}" \
    --max_seq_len 512 \
    --learning_rate 1e-3 \
    --compute_dtype float32 \
    --save_steps 10 \
    "$@"
