#!/bin/bash
# Ablation: CLIP-L-336 tower instead of SigLIP-so400m
# (reference: scripts/ablations + pretrain_mllava.sh vision_backbone).
exec bash "$(dirname "$0")/../train_mantis_8b_siglip.sh" \
  --tower_type clip "$@"
