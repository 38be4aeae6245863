"""Profiling story for the TPU build (the reference has none —
SURVEY 5.1): jax.profiler traces + per-step MFU accounting."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

# bf16 peak FLOP/s per chip by TPU generation
PEAK_FLOPS = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
}


def detect_peak_flops(default: float = 197e12) -> float:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return default
    for key, val in PEAK_FLOPS.items():
        if key in kind.replace(" ", "").replace("tpu", ""):
            return val
    if "v5litepod" in kind or "lite" in kind:
        return PEAK_FLOPS["v5e"]
    return default


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mantis_tpu_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock + MFU per step; sync on demand."""

    def __init__(self, flops_per_step: float,
                 peak_flops: Optional[float] = None):
        self.flops = flops_per_step
        self.peak = (peak_flops or
                     detect_peak_flops() * len(jax.devices()))
        self._t = None

    def start(self):
        self._t = time.perf_counter()

    def stop(self, sync_on=None) -> dict:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self._t
        return {
            "step_time_s": dt,
            "mfu": self.flops / dt / self.peak,
        }

def llama_layer_matmul_params(hidden_size: int, num_attention_heads: int,
                              num_key_value_heads: int,
                              intermediate_size: int) -> int:
    """Matmul parameters of ONE llama decoder layer — the per-layer
    factor of the standard 6*params*tokens training-FLOPs estimate.

    q+o projections (2*d*Hq·dh) + k+v (2*d*Hkv·dh) + the 3-matrix
    SwiGLU MLP (gate/up/down = 3*d*ffn).  Pinned against the real
    init_params tree in tests/test_trainer.py::test_mfu_flops_formula:
    a round-4 review found bench.py's earlier inline form halved the
    attention projections, under-reporting the measured MFU by ~8%.
    """
    d = hidden_size
    dh = d // num_attention_heads
    return (2 * d * (num_attention_heads * dh)
            + 2 * d * (num_key_value_heads * dh)
            + 3 * d * intermediate_size)
