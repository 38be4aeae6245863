"""Real multi-process multihost drive (VERDICT round-2 item 5).

Launches scripts/multihost_drive.py: 2 OS processes under
``jax.distributed.initialize`` (CPU backend, gloo collectives), a
(data=2, fsdp=2) mesh over the 4 GLOBAL devices, DistributedDataLoader
``globalize()`` -> pjit FSDP train steps.  The parent asserts disjoint
+ complete input shards and identical losses across processes.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_distributed_train_step():
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "multihost_drive.py")],
        capture_output=True, text=True, timeout=900, cwd=REPO,
        env={k: v for k, v in os.environ.items()
             if k not in ("XLA_FLAGS", "JAX_PLATFORMS")})
    assert out.returncode == 0, out.stdout + out.stderr
    assert "multihost drive OK" in out.stdout, out.stdout
