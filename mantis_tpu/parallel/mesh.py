"""Device mesh construction.

Replaces the reference's NCCL process-group plumbing
(reference: mantis/train/train_utils.py:466-545 env detection +
train_intern_vl_25.py:278-291 ring sub-groups) with a single named
``jax.sharding.Mesh``.  Axes:

  data     — data parallelism (DCN-friendly; batch axis)
  fsdp     — parameter/optimizer sharding (ZeRO-3 equivalent; ICI)
  context  — sequence/context parallelism (ring attention; ICI)
  tensor   — tensor parallelism (megatron-style; innermost ICI)

The reference's "ring group of size W inside the world" maps to
mesh shape (data=world/W, context=W).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "fsdp", "context", "tensor")


def create_mesh(
    data: int = -1,
    fsdp: int = 1,
    context: int = 1,
    tensor: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a 4-axis mesh; data=-1 absorbs the remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    fixed = fsdp * context * tensor
    if data == -1:
        assert n % fixed == 0, (n, fixed)
        data = n // fixed
    assert data * fixed == n, (
        f"mesh {data}x{fsdp}x{context}x{tensor} != {n} devices")
    arr = np.asarray(devices).reshape(data, fsdp, context, tensor)
    return Mesh(arr, AXES)


def single_device_mesh() -> Mesh:
    return create_mesh(data=1)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
