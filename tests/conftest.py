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

# ---------------------------------------------------------------------------
# Fast/slow profile (VERDICT r2 #9, re-recorded r5): the full 400-test
# net takes ~58 min of call time on this 1-core box, so
# `pytest -m "not slow"` keeps a <5-min default regression profile.
# Rather than hand-maintaining markers, tests are auto-marked from the
# recorded per-test wall times in tests/durations.json (regenerate
# with `python scripts/record_test_durations.py` — per-FILE pytest
# subprocesses; the whole suite in one process segfaults on this box);
# anything above SLOW_THRESHOLD_S is marked slow (3 s -> ~220 fast
# tests, ~4 min wall measured here).  Unrecorded (new) tests default
# to fast until the next regeneration.  Explicit @pytest.mark.slow
# still works for tests that are known-slow from birth (multi-process
# drives, engine concurrency).
# ---------------------------------------------------------------------------

import json  # noqa: E402

import pytest  # noqa: E402

SLOW_THRESHOLD_S = 3.0

_dur_path = os.path.join(os.path.dirname(__file__), "durations.json")
try:
    with open(_dur_path) as _f:
        _DURATIONS = json.load(_f)
except OSError:
    _DURATIONS = {}


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if not nodeid.startswith("tests/"):
            nodeid = "tests/" + nodeid.split("tests/")[-1]
        if _DURATIONS.get(nodeid, 0.0) > SLOW_THRESHOLD_S:
            item.add_marker(pytest.mark.slow)
