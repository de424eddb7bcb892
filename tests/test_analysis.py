"""Analysis suite tests: extractors, projections, Grad-CAM, FID,
classifier, comparison."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superdiff_tpu.analysis import (
    FeatureExtractor, extract_features, run_projection,
    run_projection_with_thumbnails, compare_tsne_umap_thumbnails,
    run_projection_3d, compute_gradcam, run_gradcam, frechet_distance,
    compute_fid)
from superdiff_tpu.analysis.classifier import train_classifier
from superdiff_tpu.analysis.features import SmallCNN
from superdiff_tpu.data import synthetic_xray_batch

RES = 32


def _batches(n_batches=4, batch=8, seed0=0):
    out = []
    for i in range(n_batches):
        imgs, labels = synthetic_xray_batch(batch, RES, seed=seed0 + i)
        out.append({"image": imgs, "label": labels})
    return out


# ------------------------------------------------------------- extractors --

def test_random_extractor_shapes():
    ex = FeatureExtractor("random")
    feats, labels = extract_features(ex, _batches(), max_samples=20)
    assert feats.shape[0] == 20 and labels.shape == (20,)
    assert feats.ndim == 2 and np.isfinite(feats).all()


def test_extractor_max_samples_cap():
    ex = FeatureExtractor("random")
    feats, _ = extract_features(ex, _batches(10), max_samples=12)
    assert feats.shape[0] == 12


def test_diffusion_extractor():
    from superdiff_tpu.diffusion import make_schedule
    from superdiff_tpu.models import CondUNet

    model = CondUNet(base_channels=8, channel_mults=(1, 2),
                     num_res_blocks=1, attn_resolutions=(),
                     num_classes=2, time_emb_dim=16, groups=4)
    x = jnp.zeros((2, RES, RES, 1))
    t = jnp.zeros((2,), dtype=jnp.int32)
    y = jnp.zeros((2,), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, y)
    ex = FeatureExtractor("diffusion", params=params, model=model,
                          schedule=make_schedule(50), timestep=10)
    feats, _ = extract_features(ex, _batches(1, 4), max_samples=4)
    assert feats.shape == (4, 16)    # bottleneck channels = 8*2
    assert np.isfinite(feats).all()


def test_extractor_validation():
    with pytest.raises(ValueError):
        FeatureExtractor("resnet50")
    with pytest.raises(ValueError):
        FeatureExtractor("classifier")    # missing model+params


# ------------------------------------------------------------ projections --

def test_run_projection_tsne(tmp_path):
    feats = np.random.default_rng(0).normal(size=(40, 16))
    labels = np.repeat([0, 1], 20)
    p = run_projection(feats, labels, "tsne", str(tmp_path / "p.png"),
                       class_names=["NORMAL", "PNEUMONIA"])
    assert os.path.exists(p) and os.path.getsize(p) > 0


def test_run_projection_unknown_method(tmp_path):
    with pytest.raises(ValueError):
        run_projection(np.zeros((10, 4)), np.zeros(10), "isomap",
                       str(tmp_path / "x.png"))


def test_umap_gated(tmp_path):
    """umap-learn absent in this image -> clear ImportError."""
    pytest.importorskip_absent = None
    try:
        import umap  # noqa: F401
        pytest.skip("umap installed here")
    except ImportError:
        pass
    with pytest.raises(ImportError):
        run_projection(np.zeros((10, 4)), np.zeros(10), "umap",
                       str(tmp_path / "x.png"))


def test_projection_thumbnails_and_compare(tmp_path):
    imgs, labels = synthetic_xray_batch(30, RES, seed=0)
    ex = FeatureExtractor("random")
    feats = ex.extract(imgs)
    p1 = run_projection_with_thumbnails(
        feats, labels, imgs, "tsne", str(tmp_path / "thumb.png"))
    p2 = compare_tsne_umap_thumbnails(
        feats, labels, imgs, str(tmp_path / "cmp.png"))
    p3 = run_projection_3d(feats, labels, "pca",
                           str(tmp_path / "p3d.png"))
    for p in (p1, p2, p3):
        assert os.path.exists(p) and os.path.getsize(p) > 0


# --------------------------------------------------------------- gradcam ---

@pytest.fixture(scope="module")
def trained_classifier():
    model, params, metrics = train_classifier(
        _batches(4, 8), num_steps=60, learning_rate=2e-3)
    return model, params, metrics


def test_classifier_learns(trained_classifier):
    _, _, metrics = trained_classifier
    assert metrics["final_acc"] > 0.7, metrics


def test_gradcam_heatmap(trained_classifier):
    model, params, _ = trained_classifier
    imgs, _ = synthetic_xray_batch(2, RES, seed=9)
    cam, pred = compute_gradcam(model, params, imgs[0])
    assert cam.ndim == 2
    assert 0.0 <= cam.min() and cam.max() <= 1.0 + 1e-6
    assert cam.max() > 0
    assert pred in (0, 1)


def test_run_gradcam_writes_overlays(trained_classifier, tmp_path):
    model, params, _ = trained_classifier
    imgs, _ = synthetic_xray_batch(3, RES, seed=11)
    paths = run_gradcam(model, params, imgs, str(tmp_path / "cam"),
                        class_names=["NORMAL", "PNEUMONIA"])
    assert len(paths) == 3
    assert all(os.path.getsize(p) > 0 for p in paths)


# ------------------------------------------------------------------- fid ---

def test_frechet_distance_zero_for_identical():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(200, 8))
    mu, sigma = f.mean(0), np.cov(f, rowvar=False)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_distance_grows_with_shift():
    rng = np.random.default_rng(0)
    f1 = rng.normal(size=(300, 8))
    f2 = rng.normal(size=(300, 8)) + 1.0
    f3 = rng.normal(size=(300, 8)) + 3.0
    mu1, s1 = f1.mean(0), np.cov(f1, rowvar=False)
    d12 = frechet_distance(mu1, s1, f2.mean(0), np.cov(f2, rowvar=False))
    d13 = frechet_distance(mu1, s1, f3.mean(0), np.cov(f3, rowvar=False))
    assert 0 < d12 < d13
    # analytic: FID between N(0,I) and N(m,I) ~= ||m||^2 = 8 (resp. 72)
    assert abs(d12 - 8.0) < 2.0


def test_compute_fid_separates_real_vs_noise():
    ex = FeatureExtractor("random")
    real_a = _batches(2, 8, seed0=0)
    real_b = _batches(2, 8, seed0=50)
    noise = [{"image": np.random.default_rng(1).normal(
        size=(8, RES, RES, 1)).astype(np.float32) * 0.5,
        "label": np.zeros(8, np.int32)} for _ in range(2)]
    fid_real = compute_fid(ex, real_a, real_b, max_samples=16)
    fid_noise = compute_fid(ex, real_a, noise, max_samples=16)
    assert fid_real < fid_noise
