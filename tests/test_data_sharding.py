"""Multi-host data sharding: strided per-process slices of one global
seeded permutation (data/dataset.py::BatchIterator(shard=...)), DataModule
local-batch resolution, and global-array assembly from process-local data
(parallel/mesh.py::shard_batch via jax.make_array_from_process_local_data).

The reference is single-process (SURVEY.md §2.4); this is the multi-host
half of the data-parallel training capability: every pod worker decodes
only 1/process_count of each epoch and feeds its local slice of the
global batch.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from superdiff_tpu.config import Config
from superdiff_tpu.data import BatchIterator, ChestXrayIndex, DataModule

NPROC = 4
N_IMAGES = 26  # deliberately not a multiple of NPROC: tests truncation


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """One-class tree where image i is constant-valued i — the pixel value
    identifies the sample through decode/resize."""
    root = tmp_path_factory.mktemp("shardxray")
    d = root / "TB" / "train" / "TUBERCULOSIS"
    d.mkdir(parents=True)
    for i in range(N_IMAGES):
        Image.fromarray(np.full((8, 8), i, dtype=np.uint8), "L").save(
            d / f"img{i:02d}.png")
    return str(root)


def _seen_ids(it):
    ids = []
    for batch in it:
        assert batch["image"].shape[0] == it.batch_size
        ids.extend(int(v) for v in batch["image"][:, 0, 0, 0])
    return ids


def test_shards_disjoint_exhaustive_lockstep(tree):
    idx = ChestXrayIndex(tree, task="TB", split="train")
    iters = [BatchIterator(idx, batch_size=2, resolution=8, shuffle=True,
                           seed=7, shard=(pid, NPROC))
             for pid in range(NPROC)]
    per_shard = [_seen_ids(it) for it in iters]

    # lockstep: every process sees the same number of samples and batches
    n_local = (N_IMAGES - N_IMAGES % NPROC) // NPROC
    assert all(len(s) == n_local for s in per_shard)
    assert all(len(it) == n_local // 2 for it in iters)

    # disjoint and (up to the truncated tail) exhaustive
    union = sorted(sum(per_shard, []))
    assert len(union) == len(set(union)) == NPROC * n_local
    assert set(union) <= set(range(N_IMAGES))


def test_shard_epochs_reshuffle_globally(tree):
    """Epoch advance re-deals samples across shards (one global permutation
    per epoch), while any given epoch stays disjoint across processes."""
    idx = ChestXrayIndex(tree, task="TB", split="train")
    it0 = BatchIterator(idx, batch_size=2, resolution=8, shuffle=True,
                        seed=7, shard=(0, NPROC))
    e1, e2 = _seen_ids(it0), _seen_ids(it0)
    assert e1 != e2  # same shard, new epoch, new global order
    # replaying epoch 0 on a fresh iterator reproduces it exactly
    it0b = BatchIterator(idx, batch_size=2, resolution=8, shuffle=True,
                         seed=7, shard=(0, NPROC))
    assert _seen_ids(it0b) == e1


def test_bad_shard_rejected(tree):
    idx = ChestXrayIndex(tree, task="TB", split="train")
    with pytest.raises(ValueError, match="shard"):
        BatchIterator(idx, batch_size=2, resolution=8, shard=(4, 4))


def test_datamodule_shard_local_batch(tree):
    cfg = Config()
    cfg.task = "TB"
    cfg.training.batch_size = 8          # global
    cfg.training.resolution = 8
    cfg.training.class_filter = None
    cfg.training.use_native_loader = False
    dm = DataModule(cfg, tree, data_shard=(1, 2))
    assert dm.resolve_shard() == (1, 2)
    it = dm.iterator("train", epoch=0)
    batch = next(iter(it))
    assert batch["image"].shape[0] == 4  # local = global / process_count

    # indivisible global batch must be rejected loudly
    cfg.training.batch_size = 9
    dm2 = DataModule(cfg, tree, data_shard=(0, 2))
    with pytest.raises(ValueError, match="divisible"):
        dm2.iterator("train", epoch=0)


def test_datamodule_unsharded_by_default(tree):
    cfg = Config()
    cfg.task = "TB"
    cfg.training.batch_size = 4
    cfg.training.resolution = 8
    cfg.training.class_filter = None
    cfg.training.use_native_loader = False
    dm = DataModule(cfg, tree)
    assert dm.resolve_shard() is None    # single jax process
    batch = next(iter(dm.iterator("train", epoch=0)))
    assert batch["image"].shape[0] == 4


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
assert jax.process_count() == 2

# Each process holds the strided local slice the DataModule would produce
# for a global batch of 8 rows (value = global row id), and shard_batch
# must assemble them into ONE global array whose jitted global mean is the
# true mean over all 8 rows — on both processes.
GLOBAL = np.arange(8, dtype=np.float32)[:, None] * np.ones((8, 3),
                                                           np.float32)
pid = jax.process_index()
local = GLOBAL[pid * 4:(pid + 1) * 4]   # contiguous local rows

from superdiff_tpu.parallel import shard_batch
mesh = make_mesh(4)
batch = shard_batch({"image": local}, mesh)
g = batch["image"]
assert g.shape == (8, 3), g.shape       # global shape, not local
from jax.sharding import NamedSharding, PartitionSpec as P
mean = jax.jit(lambda b: jnp.mean(b["image"]),
               out_shardings=NamedSharding(mesh, P()))(batch)
got = float(np.asarray(mean.addressable_shards[0].data))
assert abs(got - float(GLOBAL.mean())) < 1e-6, got
print("SHARD_BATCH_OK", pid, got)
"""


def test_two_process_shard_batch_assembly():
    """Two coordinator-connected CPU processes assemble their local batch
    slices into one global array via shard_batch and agree on the global
    mean — the exact mechanics multi-host training feeds the step with."""
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
    for pid in (0, 1):
        assert any(f"SHARD_BATCH_OK {pid} 3.5" in out
                   for _, out, _ in outs), outs
