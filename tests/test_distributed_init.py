"""Structural validation of the multi-host initialization path.

No multi-host hardware exists here (or in CI), but the code path itself —
``maybe_init_distributed`` -> ``jax.distributed.initialize`` -> collectives
over the resulting topology — can and must execute: a 1-process
"distributed cluster" on the CPU backend goes through the full coordinator
handshake (service + client), after which process_count/process_index are
live and a sharded computation runs. The reference has no multi-host path
at all (SURVEY.md §2.4); this pins ours as actually runnable, not just
env-gated dead code.

Runs in a subprocess: jax.distributed state is process-global and must not
leak into the other tests.
"""

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import os
os.environ["SUPERDIFF_TPU_MULTIHOST"] = "1"
os.environ["SUPERDIFF_TPU_COORDINATOR"] = "localhost:@PORT@"
os.environ["SUPERDIFF_TPU_NUM_PROCESSES"] = "1"
os.environ["SUPERDIFF_TPU_PROCESS_ID"] = "0"
os.environ["SUPERDIFF_TPU_PLATFORM"] = "cpu"
os.environ["SUPERDIFF_TPU_CPU_DEVICES"] = "4"

from superdiff_tpu.parallel import maybe_init_distributed, make_mesh
maybe_init_distributed()

import jax
import jax.numpy as jnp
assert jax.process_count() == 1, jax.process_count()
assert jax.process_index() == 0

# a sharded computation over the post-init topology
from superdiff_tpu.parallel import shard_batch
mesh = make_mesh(4)
batch = shard_batch({"x": jnp.arange(8.0)}, mesh)
total = float(jnp.sum(batch["x"]))
assert total == 28.0, total
print("DISTRIBUTED_INIT_OK", jax.process_count(), len(jax.devices()))
"""


def test_incomplete_coordinator_triple_rejected(monkeypatch):
    """COORDINATOR without NUM_PROCESSES/PROCESS_ID must raise a clear
    ValueError naming the required vars, not a KeyError (round-2 review)."""
    from superdiff_tpu.parallel import maybe_init_distributed

    monkeypatch.setenv("SUPERDIFF_TPU_MULTIHOST", "1")
    monkeypatch.setenv("SUPERDIFF_TPU_COORDINATOR", "localhost:1234")
    monkeypatch.delenv("SUPERDIFF_TPU_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("SUPERDIFF_TPU_PROCESS_ID", raising=False)
    with pytest.raises(ValueError, match="SUPERDIFF_TPU_NUM_PROCESSES"):
        maybe_init_distributed()


def test_single_process_distributed_init():
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.replace("@PORT@", str(port))],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "DISTRIBUTED_INIT_OK 1 4" in proc.stdout
