"""Orbax checkpointing with HF-Trainer-style auto-resume.

Replaces the reference's HF Trainer checkpoint handling (save_steps /
save_total_limit, ZeRO-3 16-bit gather on save) and the auto-resume scan
for the latest ``checkpoint-*`` directory
(reference: mantis/train/train_mllava.py:281-294, train_mllava.sh:163-166).
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


CKPT_RE = re.compile(r"^checkpoint-(\d+)$")


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Find the newest checkpoint-<step> dir (reference scan semantics)."""
    if not os.path.isdir(output_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(output_dir):
        m = CKPT_RE.match(name)
        if m and int(m.group(1)) > best_step:
            path = os.path.join(output_dir, name)
            if os.path.isdir(path):
                best, best_step = path, int(m.group(1))
    return best


class CheckpointManager:
    """Thin wrapper over orbax StandardCheckpointer with retention."""

    def __init__(self, output_dir: str, save_total_limit: int = 1):
        self.output_dir = os.path.abspath(output_dir)
        self.save_total_limit = save_total_limit
        os.makedirs(self.output_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def save(self, step: int, state: Any) -> str:
        path = os.path.join(self.output_dir, f"checkpoint-{step}")
        self._ckpt.save(path + ".tmp_orbax", state, force=True)
        self._ckpt.wait_until_finished()
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(path + ".tmp_orbax", path)
        self._prune()
        return path

    def _prune(self):
        ckpts = sorted(
            ((int(CKPT_RE.match(n).group(1)), n)
             for n in os.listdir(self.output_dir) if CKPT_RE.match(n)),
        )
        while len(ckpts) > self.save_total_limit:
            _, name = ckpts.pop(0)
            shutil.rmtree(os.path.join(self.output_dir, name),
                          ignore_errors=True)

    def restore_latest(self, template: Any) -> Tuple[Optional[Any], int]:
        """Returns (state, step) or (None, 0) when nothing to resume."""
        path = latest_checkpoint(self.output_dir)
        if path is None:
            return None, 0
        abstract = jax.tree.map(
            ocp.utils.to_shape_dtype_struct, template)
        state = self._ckpt.restore(path, abstract)
        step = int(CKPT_RE.match(os.path.basename(path)).group(1))
        return state, step

    def close(self):
        self._ckpt.close()
