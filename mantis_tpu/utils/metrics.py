"""Metrics logging + MFU accounting.

The reference logs through wandb via HF Trainer (reference:
scripts/train_mllava.sh:171 ``report_to wandb``); here metrics stream to
a JSONL file (wandb is not in this image — gated import) and stdout, and
MFU is computed from an analytic FLOP estimate.
"""

from __future__ import annotations

import json
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, use_wandb: bool = False,
                 project: str = "Mantis"):
        self.path = path
        self._fh = open(path, "a") if path else None
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(project=project)
                self.wandb = wandb
            except ImportError:
                print("wandb not available; logging to JSONL only")

    def log(self, **metrics):
        metrics.setdefault("ts", time.time())
        line = json.dumps(metrics)
        print(line, flush=True)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.wandb:
            self.wandb.log(metrics)

    def close(self):
        if self._fh:
            self._fh.close()


def count_params(tree) -> int:
    import jax

    return sum(x.size for x in jax.tree.leaves(tree))


def estimate_train_flops(cfg) -> float:
    """Training FLOPs per text token: 6*N_lm (fwd+bwd) for the decoder.

    Vision-tower FLOPs are charged per image elsewhere; for mixed batches
    this underestimates slightly (conservative MFU).
    """
    t = cfg.text_config
    d, li = t.hidden_size, t.intermediate_size
    dh = t.head_dim or d // t.num_attention_heads
    per_layer = (
        2 * d * (t.num_attention_heads * dh)        # q
        + 4 * d * (t.num_key_value_heads * dh)      # k, v
        + 2 * (t.num_attention_heads * dh) * d      # o
        + 6 * d * li                                # gate, up, down
    )
    # per_layer above is 2*params_in_layer = forward FLOPs per token;
    # training = fwd + bwd = 3x forward = 6*N_params per token.
    # (Attention-score FLOPs are seq-length dependent and omitted.)
    fwd = t.num_hidden_layers * per_layer + 2 * d * t.vocab_size
    return 3.0 * fwd

