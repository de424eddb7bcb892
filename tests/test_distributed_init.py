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


_TWO_PROC_SCRIPT = r"""
import os
os.environ["SUPERDIFF_TPU_MULTIHOST"] = "1"
os.environ["SUPERDIFF_TPU_COORDINATOR"] = "localhost:@PORT@"
os.environ["SUPERDIFF_TPU_NUM_PROCESSES"] = "2"
os.environ["SUPERDIFF_TPU_PROCESS_ID"] = "@PID@"
os.environ["SUPERDIFF_TPU_PLATFORM"] = "cpu"
os.environ["SUPERDIFF_TPU_CPU_DEVICES"] = "2"

from superdiff_tpu.parallel import maybe_init_distributed, make_mesh
maybe_init_distributed()

import jax
import jax.numpy as jnp
import numpy as np
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()          # 2 local x 2 procs
assert len(jax.local_devices()) == 2

# cross-process collective #1: allgather of the process index over the
# coordinator-connected cluster
from jax.experimental import multihost_utils
got = np.asarray(multihost_utils.process_allgather(
    jnp.array([jax.process_index()], dtype=jnp.int32))).ravel()
assert sorted(got.tolist()) == [0, 1], got

# cross-process collective #2: a psum over the GLOBAL 4-device mesh via
# shard_map — the reduction XLA must route between the two processes
# (what scripts/tpu_pod_run.sh's per-host launches rely on)
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

mesh = make_mesh(4)
sharding = NamedSharding(mesh, P("data"))
x = jax.make_array_from_callback(
    (4,), sharding, lambda idx: np.arange(4.0)[idx])
f = jax.jit(shard_map(lambda a: jax.lax.psum(a, "data"), mesh=mesh,
                      in_specs=P("data"), out_specs=P()))
total = f(x)
# each process only sees its addressable shard of the replicated output
local = float(np.asarray(total.addressable_shards[0].data).ravel()[0])
assert local == 6.0, local
print("TWO_PROC_OK", jax.process_index(), local)
"""


def test_two_process_psum():
    """Two coordinator-connected CPU processes run a cross-process
    allgather and a global-mesh psum (VERDICT r2 #9) — pinning the
    multi-host path the pod launcher (scripts/tpu_pod_run.sh) drives."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             _TWO_PROC_SCRIPT.replace("@PORT@", str(port))
             .replace("@PID@", str(pid))],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=cwd)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    assert all(rc == 0 for rc, _, _ in outs), outs
    assert any("TWO_PROC_OK 0 6.0" in out for _, out, _ in outs), outs
    assert any("TWO_PROC_OK 1 6.0" in out for _, out, _ in outs), outs
