#!/bin/bash
# Ablation: no sequence packing (isolates the packing win).
NOPACK=1 exec bash "$(dirname "$0")/../train_mantis_8b_siglip.sh" "$@"
