"""Host-offloaded optimizer state (zero3_offload equivalent)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mantis_tpu.parallel.offload import (
    host_memory_supported,
    offload_tree_to_host,
    to_device,
    to_host,
)


def test_offload_roundtrip_or_fallback():
    tree = {"m": jnp.ones((8, 8)), "v": jnp.zeros((4,))}
    off = offload_tree_to_host(tree)
    if host_memory_supported():
        assert off["m"].sharding.memory_kind == "pinned_host"
    # values survive either way and stay usable in compute
    out = jax.jit(lambda t: t["m"].sum() + t["v"].sum())(off)
    assert float(out) == 64.0


@pytest.mark.skipif(not host_memory_supported(),
                    reason="backend has no pinned_host memory")
def test_update_step_with_host_state():
    import optax

    params = {"w": jnp.ones((16, 16))}
    tx = optax.adam(1e-2)
    opt_state = offload_tree_to_host(tx.init(params))

    @jax.jit
    def step(params, opt_state):
        grads = jax.tree.map(jnp.ones_like, params)
        opt_state = to_device(opt_state)  # stream moments in
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates),
                to_host(opt_state))     # stream moments back out

    params2, opt_state2 = step(params, opt_state)
    assert float(jnp.abs(params2["w"] - 1.0).max()) > 0
    if jax.default_backend() == "tpu":
        # CPU reports pinned_host support but jit outputs land in the
        # default space; the kind is only guaranteed on TPU
        leaves = [x for x in jax.tree.leaves(opt_state2)
                  if hasattr(x, "sharding") and x.ndim]
        assert all(l.sharding.memory_kind == "pinned_host"
                   for l in leaves)
