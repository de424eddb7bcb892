"""Data layer tests: index, splitter, transforms, datamodule."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from superdiff_tpu.config import Config
from superdiff_tpu.data import (
    ChestXrayIndex, BatchIterator, split_dataset, is_split_already_done,
    normalize, denormalize, augment, prepare_batch, host_resize, clahe,
    DataModule, synthetic_xray_batch)


# ------------------------------------------------------------- fixtures ----

@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """Tiny dataset tree: root/TASK/split/CLASS/*.png"""
    root = tmp_path_factory.mktemp("xray")
    rng = np.random.default_rng(0)
    for split, n in (("train", 12), ("val", 4), ("test", 4)):
        for ci, cls in enumerate(["NORMAL", "PNEUMONIA"]):
            d = root / "PNEUMONIA" / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                arr = (rng.random((40 + 10 * ci, 60)) * 255).astype("uint8")
                Image.fromarray(arr, "L").save(d / f"img{i}.png")
    return str(root)


@pytest.fixture(scope="module")
def flat_tree(tmp_path_factory):
    """Flat source tree for the splitter: source/CLASS/*.png"""
    root = tmp_path_factory.mktemp("flat")
    for cls in ["NORMAL", "PNEUMONIA"]:
        d = root / cls
        d.mkdir()
        for i in range(20):
            Image.fromarray(np.zeros((8, 8), "uint8"), "L").save(
                d / f"{cls.lower()}{i}.png")
    return str(root)


# ----------------------------------------------------------------- index ---

def test_index_and_counts(tree):
    idx = ChestXrayIndex(tree, task="PNEUMONIA", split="train")
    assert len(idx) == 24
    assert idx.classes == ["NORMAL", "PNEUMONIA"]
    assert idx.class_counts() == {"NORMAL": 12, "PNEUMONIA": 12}


def test_index_class_filter(tree):
    idx = ChestXrayIndex(tree, task="PNEUMONIA", split="train",
                         class_filter=1)
    assert len(idx) == 12
    assert all(lbl == 1 for _, lbl in idx.samples)


def test_index_missing_dir(tree):
    with pytest.raises(FileNotFoundError):
        ChestXrayIndex(tree, task="TB", split="train")


def test_batch_iterator_shapes_and_shuffle(tree):
    idx = ChestXrayIndex(tree, task="PNEUMONIA", split="train")
    it = BatchIterator(idx, batch_size=8, resolution=32, seed=1)
    batches = list(it)
    assert len(batches) == 3
    b = batches[0]
    assert b["image"].shape == (8, 32, 32, 1)
    assert b["image"].dtype == np.uint8
    assert b["label"].shape == (8,)
    # different epoch -> different order
    order1 = [tuple(b["label"]) for b in it]
    order2 = [tuple(b["label"]) for b in it]
    assert order1 != order2 or len(order1) == 0  # shuffling epoch-dependent


# -------------------------------------------------------------- splitter ---

def test_split_dataset(flat_tree, tmp_path):
    dest = str(tmp_path / "split")
    counts = split_dataset(flat_tree, dest, seed=1)
    assert counts["train"] == 28 and counts["val"] == 6 \
        and counts["test"] == 6
    assert is_split_already_done(dest)
    # idempotent: second call is a no-op returning existing counts
    again = split_dataset(flat_tree, dest, seed=2)
    assert again["train"] == 28


def test_split_bad_ratios(flat_tree, tmp_path):
    with pytest.raises(ValueError):
        split_dataset(flat_tree, str(tmp_path / "x"), ratios=(0.5, 0.2, 0.2))


# ------------------------------------------------------------ transforms ---

def test_host_resize_strategies():
    img = Image.fromarray(np.arange(40 * 60, dtype=np.uint8)
                          .reshape(40, 60) % 255, "L")
    for strat in ("pad", "center_crop", "resize"):
        out = host_resize(img, 32, strat)
        assert out.shape == (32, 32) and out.dtype == np.uint8
    with pytest.raises(ValueError):
        host_resize(img, 32, "stretch")


def test_clahe_runs():
    img = (np.random.default_rng(0).random((64, 64)) * 255).astype("uint8")
    out = clahe(img)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_normalize_modes():
    x = jnp.linspace(0, 1, 32).reshape(1, 4, 8, 1)
    mm = normalize(x, "minmax")
    assert float(mm.min()) == 0.0 and float(mm.max()) == 1.0
    zs = normalize(x, "zscore")
    np.testing.assert_allclose(np.asarray(zs), (np.asarray(x) - .5) / .25,
                               rtol=1e-6)
    th = normalize(x, "tanh")
    assert float(th.min()) == -1.0 and float(th.max()) == 1.0
    assert (np.asarray(normalize(x, "none")) == np.asarray(x)).all()
    with pytest.raises(ValueError):
        normalize(x, "robust")


def test_denormalize_inverts():
    x = jnp.linspace(0, 1, 64).reshape(1, 8, 8, 1)
    for mode in ("tanh", "zscore"):
        back = denormalize(normalize(x, mode), mode)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                                   rtol=1e-5, atol=1e-6)


def test_augment_tiers(rng):
    imgs, _ = synthetic_xray_batch(8, 32, seed=0, normalization="minmax")
    x = jnp.asarray(imgs)
    assert (np.asarray(augment(x, rng, risk="none")) == np.asarray(x)).all()
    for risk in ("low", "medium"):
        out = augment(x, rng, risk=risk)
        assert out.shape == x.shape
        assert float(out.min()) >= -1e-5 and float(out.max()) <= 1 + 1e-5
        assert not (np.asarray(out) == np.asarray(x)).all()
    with pytest.raises(ValueError):
        augment(x, rng, risk="high")   # "Avoid high-risk medical augs"
    with pytest.raises(ValueError):
        augment(x, rng, risk="extreme")


def test_augment_deterministic_given_key(rng):
    imgs, _ = synthetic_xray_batch(4, 16, seed=0, normalization="minmax")
    x = jnp.asarray(imgs)
    a = augment(x, rng, risk="medium")
    b = augment(x, rng, risk="medium")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rotation_actually_rotates(rng):
    # vertical bar rotated 15 deg must move mass off the original column
    x = jnp.zeros((1, 33, 33, 1)).at[:, :, 16, :].set(1.0)
    out = augment(x, jax.random.PRNGKey(3), risk="medium")
    moved = np.asarray(out)[0, :, :, 0]
    orig = np.asarray(x)[0, :, :, 0]
    assert not np.allclose(moved, orig)


def test_prepare_batch_end_to_end(rng):
    imgs = (np.random.default_rng(0).random((4, 16, 16, 1)) * 255
            ).astype(np.uint8)
    out = prepare_batch(jnp.asarray(imgs), rng, augmentation="low",
                        normalization="tanh")
    assert out.dtype == jnp.float32
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0


# ------------------------------------------------------------ datamodule ---

def test_datamodule(tree, rng):
    cfg = Config()
    cfg.task = "PNEUMONIA"
    cfg.training.batch_size = 4
    cfg.training.resolution = 32
    dm = DataModule(cfg, tree)
    assert dm.class_counts("train") == {"NORMAL": 12, "PNEUMONIA": 12}
    batches = list(dm.device_batches("train", rng))
    assert len(batches) == 6
    img = batches[0]["image"]
    assert img.shape == (4, 32, 32, 1) and img.dtype == jnp.float32
    assert float(img.min()) >= -1.0 and float(img.max()) <= 1.0
    # val path: no augmentation, deterministic
    v1 = [np.asarray(b["image"]) for b in dm.device_batches("val", rng)]
    v2 = [np.asarray(b["image"]) for b in dm.device_batches("val", rng)]
    for a, b in zip(v1, v2):
        np.testing.assert_array_equal(a, b)


def test_datamodule_reshuffles_each_epoch(tree):
    """Successive iterator() calls must advance the shuffle order (a fixed
    seed per call would replay the identical order every epoch — round-1
    advisor finding), while an explicit epoch= replays deterministically."""
    cfg = Config()
    cfg.task = "PNEUMONIA"
    cfg.training.batch_size = 4
    cfg.training.resolution = 16
    dm = DataModule(cfg, tree)

    def epoch_labels(**kw):
        return np.concatenate(
            [b["label"] for b in dm.iterator("train", **kw)])

    e0, e1, e2 = epoch_labels(), epoch_labels(), epoch_labels()
    assert not (np.array_equal(e0, e1) and np.array_equal(e1, e2)), \
        "train shuffle order identical across epochs"
    # explicit epoch: deterministic replay, independent of the counter
    np.testing.assert_array_equal(epoch_labels(epoch=0),
                                  epoch_labels(epoch=0))


def test_datamodule_probe_does_not_perturb_stream(tree):
    """iterator() returns a fresh object per call: probing one (dashboard
    next(iter(...)), len()) must not restart or advance another consumer's
    stream mid-epoch (round-2 review finding)."""
    cfg = Config()
    cfg.task = "PNEUMONIA"
    cfg.training.batch_size = 4
    cfg.training.resolution = 16
    dm = DataModule(cfg, tree)

    it = dm.iterator("train", epoch=3)
    gen = iter(it)
    first = next(gen)["label"]
    # interleave a probe on the same split/key
    next(iter(dm.iterator("train", epoch=0)))
    rest = [b["label"] for b in gen]
    # the original stream continues its own epoch-3 order, unperturbed
    expected = np.concatenate(
        [b["label"] for b in dm.iterator("train", epoch=3)])
    np.testing.assert_array_equal(
        np.concatenate([first] + rest), expected)


def test_shear3_rotation_matches_direct_bilinear():
    """The 3-shear rotation (the TPU-native path `augment` dispatches)
    matches the direct bilinear gather on smooth images. White noise is
    deliberately avoided: it decorrelates at 1 px, so any two resamplers
    differ pointwise there."""
    from superdiff_tpu.data.transforms import (_rotate_bilinear,
                                               _rotate_shear3)

    H = W = 64
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    smooth = np.stack([
        0.5 + 0.4 * np.sin(yy / 9.0) * np.cos(xx / 7.0),
        yy / H * 0.8 + 0.1,
    ])[..., None]                                       # (2, H, W, 1)
    img = jnp.asarray(smooth)
    ang = jnp.asarray(np.array([0.2, -0.25], np.float32))

    direct = jax.vmap(_rotate_bilinear)(img, ang)
    shear = _rotate_shear3(img, ang, max_deg=15.0)
    m = 8                                               # borders clamp differently
    diff = np.abs(np.asarray(direct - shear))[:, m:-m, m:-m]
    assert diff.max() < 6e-3, diff.max()

    # zero angle is the exact identity (hat weight 1 at shift 0)
    ident = _rotate_shear3(img, jnp.zeros((2,)), max_deg=15.0)
    np.testing.assert_allclose(np.asarray(ident), np.asarray(img),
                               atol=1e-6)
