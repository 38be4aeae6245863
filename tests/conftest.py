"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; all sharding/collective
tests run against 8 virtual CPU devices, and Pallas kernels run in
interpreter mode (selected automatically when the backend is not TPU).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep HF libraries fully offline in tests.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

# The environment may force JAX_PLATFORMS at interpreter startup (axon
# tunnel); override through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
