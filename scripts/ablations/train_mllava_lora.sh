#!/bin/bash
# Ablation: LoRA r=128/alpha=256 instead of full SFT
# (reference: train_mllava.py:63-70 defaults; ZeRO-2-for-LoRA setting).
exec bash "$(dirname "$0")/../train_mantis_8b_siglip.sh" \
  --use_lora --lora_r 128 --lora_alpha 256 "$@"
