"""Host offload of optimizer state — the ZeRO-3-offload equivalent.

The reference's zero3_offload config keeps Adam moments in host RAM
(reference: mantis/train/zero_configs/zero3_offload.json); on TPU the
idiomatic version is a ``pinned_host`` memory-kind sharding on the
optimizer-state leaves: XLA streams them over PCIe during the optimizer
update, freeing HBM for params/activations at the cost of update-step
bandwidth.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.memory import Space
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def host_memory_supported() -> bool:
    try:
        dev = jax.devices()[0]
        if dev.platform != "tpu":
            # CPU advertises pinned_host but a donated jit whose input
            # lives there trips FAILED_PRECONDITION (memory-kind
            # mismatch on the reused buffer), and host==device memory
            # there anyway — offload is meaningful only on TPU
            return False
        return "pinned_host" in [m.kind for m in dev.addressable_memories()]
    except Exception:
        return False


def host_sharding(mesh: Optional[Mesh] = None,
                  spec: P = P()) -> NamedSharding:
    """Pass the TRAINING mesh on multi-device setups: the single-device
    fallback mesh here is incompatible with a step jitted over the real
    mesh (device-assignment mismatch at trace time) and would funnel
    the whole state into device 0's host memory."""
    if mesh is None:
        import numpy as _np

        # default: replicate over ALL devices (device set matches any
        # training mesh in default order) — a device-0-only mesh would
        # mismatch a multi-device step's device assignment and funnel
        # the whole state into one host buffer
        mesh = Mesh(_np.array(jax.devices()), ("_offload",))
    return NamedSharding(mesh, spec, memory_kind="pinned_host")


def offload_tree_to_host(tree: Any, mesh: Optional[Mesh] = None) -> Any:
    """Move every array leaf into pinned host memory (keeps shardings
    replicated; FSDP-sharded host offload would pass per-leaf specs)."""
    if not host_memory_supported():
        return tree  # graceful fallback: stay in device memory
    sh = host_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def offload_out_shardings(state_tree: Any, mesh: Optional[Mesh] = None):
    """Matching out_shardings pytree so a jitted train step writes the
    updated optimizer state straight back to host memory."""
    if not host_memory_supported():
        return None
    sh = host_sharding(mesh)
    return jax.tree.map(lambda _: sh, state_tree)


def to_device(tree: Any) -> Any:
    """Stream a host-resident tree into device memory (usable inside
    jit; this is where the optimizer update reads the moments)."""
    if not host_memory_supported():
        return tree  # graceful no-op pairing to_host's fallback
    return jax.tree.map(lambda x: jax.device_put(x, Space.Device), tree)


def to_host(tree: Any) -> Any:
    """Stream a tree back to pinned host memory (inside jit)."""
    if not host_memory_supported():
        return tree
    return jax.tree.map(lambda x: jax.device_put(x, Space.Host), tree)
