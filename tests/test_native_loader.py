"""Native C++ shard-cache loader tests (builds the .so on demand)."""

import os

import numpy as np
import pytest

from superdiff_tpu.data.native_loader import (
    NativeBatchIterator, build_shard_from_index, write_shard)

pytestmark = pytest.mark.skipif(
    not NativeBatchIterator.available(),
    reason="native loader could not be built")


@pytest.fixture(scope="module")
def shard(tmp_path_factory):
    rng = np.random.default_rng(0)
    images = (rng.random((37, 16, 16, 1)) * 255).astype(np.uint8)
    labels = (np.arange(37) % 2).astype(np.int32)
    path = str(tmp_path_factory.mktemp("shard") / "train.xrc")
    write_shard(path, images, labels)
    return path, images, labels


def test_iterates_all_batches(shard):
    path, images, labels = shard
    it = NativeBatchIterator(path, batch_size=8, seed=1)
    assert (it.n, it.height, it.width, it.channels) == (37, 16, 16, 1)
    assert len(it) == 4          # drop_last: 37 // 8
    batches = list(it)
    assert len(batches) == 4
    for b in batches:
        assert b["image"].shape == (8, 16, 16, 1)
        assert b["image"].dtype == np.uint8
    it.close()


def test_batches_match_source_exactly(shard):
    """Every served (image, label) pair must be a real source pair."""
    path, images, labels = shard
    lookup = {images[i].tobytes(): labels[i] for i in range(len(labels))}
    it = NativeBatchIterator(path, batch_size=5, seed=3)
    seen = set()
    for b in it:
        for img, lab in zip(b["image"], b["label"]):
            key = img.tobytes()
            assert key in lookup, "served image not in source data"
            assert lookup[key] == lab, "label mismatch"
            seen.add(key)
    assert len(seen) == 35       # 7 batches of 5
    it.close()


def test_shuffle_differs_across_epochs(shard):
    path, _, _ = shard
    it = NativeBatchIterator(path, batch_size=8, seed=1)
    e1 = np.concatenate([b["label"] for b in it])
    e2 = np.concatenate([b["label"] for b in it])
    assert e1.shape == e2.shape == (32,)
    # same multiset, different order (w.h.p.)
    assert sorted(e1.tolist()) == sorted(e2.tolist())
    assert not np.array_equal(e1, e2)
    it.close()


def test_drop_last_false(shard):
    path, _, _ = shard
    it = NativeBatchIterator(path, batch_size=8, seed=1, drop_last=False)
    batches = list(it)
    assert len(batches) == 5
    assert batches[-1]["image"].shape[0] == 5    # 37 - 32
    total = sum(b["image"].shape[0] for b in batches)
    assert total == 37
    it.close()


def test_bad_shard_rejected(tmp_path):
    bad = str(tmp_path / "bad.xrc")
    with open(bad, "wb") as f:
        f.write(b"NOPE" + b"\x00" * 64)
    with pytest.raises(FileNotFoundError):
        NativeBatchIterator(bad, batch_size=2)


def test_build_shard_from_index(tmp_path):
    from PIL import Image

    from superdiff_tpu.data.dataset import ChestXrayIndex

    root = tmp_path / "t" / "train"
    rng = np.random.default_rng(0)
    for cls in ("A", "B"):
        d = root / cls
        d.mkdir(parents=True)
        for i in range(6):
            arr = (rng.random((20, 30)) * 255).astype("uint8")
            Image.fromarray(arr, "L").save(d / f"{i}.png")
    idx = ChestXrayIndex(str(tmp_path / "t"), split="train")
    shard_path = str(tmp_path / "train.xrc")
    build_shard_from_index(idx, shard_path, resolution=16)
    it = NativeBatchIterator(shard_path, batch_size=4)
    assert it.n == 12 and it.height == 16
    batches = list(it)
    assert len(batches) == 3
    it.close()


def test_throughput_sane(tmp_path):
    """At realistic image sizes the loader should push > 100 MB/s."""
    import time

    rng = np.random.default_rng(0)
    images = (rng.random((256, 64, 64, 1)) * 255).astype(np.uint8)
    labels = (np.arange(256) % 2).astype(np.int32)
    path = str(tmp_path / "big.xrc")
    write_shard(path, images, labels)
    it = NativeBatchIterator(path, batch_size=32, seed=1)
    list(it)  # warm the page cache
    tic = time.perf_counter()
    n_bytes = 0
    for _ in range(5):
        for b in it:
            n_bytes += b["image"].nbytes
    dt = time.perf_counter() - tic
    assert n_bytes / dt > 100e6, f"{n_bytes/dt/1e6:.1f} MB/s"
    it.close()


def _ids(it, images):
    """Identify served examples by their exact bytes (first pixel is
    unique per example in the shard fixture below)."""
    ids = []
    for b in it:
        ids.extend(int(v) for v in b["image"][:, 0, 0, 0])
    return ids


@pytest.fixture(scope="module")
def id_shard(tmp_path_factory):
    n = 26  # not a multiple of the shard count: tests truncation
    images = np.zeros((n, 8, 8, 1), dtype=np.uint8)
    images[:, 0, 0, 0] = np.arange(n)
    labels = (np.arange(n) % 2).astype(np.int32)
    path = str(tmp_path_factory.mktemp("idshard") / "t.xrc")
    write_shard(path, images, labels)
    return path


def test_native_shards_disjoint_exhaustive_lockstep(id_shard):
    """Multi-host slices out of the C++ loader: same global permutation,
    disjoint strided shards, equal batch counts (mirrors the Python
    BatchIterator shard semantics in tests/test_data_sharding.py)."""
    nproc = 4
    iters = [NativeBatchIterator(id_shard, batch_size=2, seed=7,
                                 shard=(pid, nproc))
             for pid in range(nproc)]
    per_shard = [_ids(it, None) for it in iters]
    n_local = (26 - 26 % nproc) // nproc
    assert all(len(s) == n_local for s in per_shard)
    assert all(len(it) == n_local // 2 for it in iters)
    union = sorted(sum(per_shard, []))
    assert len(union) == len(set(union)) == nproc * n_local
    for it in iters:
        it.close()


def test_native_shard_epoch_replay(id_shard):
    it = NativeBatchIterator(id_shard, batch_size=2, seed=7, shard=(1, 4))
    e1, e2 = _ids(it, None), _ids(it, None)
    assert e1 != e2
    it.close()
    it2 = NativeBatchIterator(id_shard, batch_size=2, seed=7, shard=(1, 4))
    assert _ids(it2, None) == e1
    it2.close()


def test_native_bad_shard_rejected(id_shard):
    with pytest.raises(ValueError, match="shard"):
        NativeBatchIterator(id_shard, batch_size=2, shard=(4, 4))
