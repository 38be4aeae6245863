"""Rematerialization (gradient-checkpoint) policy selection.

The reference gets exactly one knob — HF ``gradient_checkpointing``
on/off (scripts/train_mllava.sh:168) — because torch recompute is
all-or-nothing per block.  Under XLA the policy is a real lever:
``nothing`` (recompute the whole layer in backward, minimum memory)
vs ``dots`` (save matmul outputs, recompute only elementwise ops).
Measured on the flagship SFT step (bf16, seq 8192, packed segments,
v5e): ``dots`` lifts MFU 0.510 -> 0.547 (+7%) and the saved
activations fit the v5p-8 SFT target at per-device batch 1
(~1.2 GB/layer; docs/PERF.md "Remat policy").  No remat at all OOMs
already at 2 layers on a 16 GB chip, so ``dots`` is the practical
fast setting.
"""
from typing import Union

import jax

POLICIES = {
    "nothing": jax.checkpoint_policies.nothing_saveable,
    "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    # "pairs": checkpoint TWO decoder layers per block (halves the
    # saved layer inputs for ~1.5x in-pair recompute).  Only the
    # unstacked-list decoder path (models/llama.py) implements the
    # pairing itself; every other consumer of the flag (vision tower,
    # scan path) degrades to per-layer nothing_saveable.
    "pairs": jax.checkpoint_policies.nothing_saveable,
}


def remat(fn, use_remat: Union[bool, str]):
    """Wrap a scan layer body in jax.checkpoint per the policy flag.

    ``use_remat`` is False (no remat), True (= "nothing", the
    memory-minimal default), or a policy name from POLICIES.  Model
    forwards thread their existing ``use_remat`` argument straight
    through, so a policy name flows from the trainer CLI to every
    architecture without new plumbing.
    """
    if not use_remat:
        return fn
    name = use_remat if isinstance(use_remat, str) else "nothing"
    return jax.checkpoint(fn, policy=POLICIES[name])
