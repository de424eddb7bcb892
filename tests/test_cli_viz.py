"""Inspect/visualize CLI + utils tests (on a tiny on-disk dataset tree)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from superdiff_tpu.config import Config
from superdiff_tpu.utils import (
    init_logger, MetricsLogger, resolve_paths, set_global_seeds)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("xray2")
    rng = np.random.default_rng(0)
    for split in ("train", "test"):
        for cls in ("NORMAL", "PNEUMONIA"):
            d = root / "PNEUMONIA" / split / cls
            d.mkdir(parents=True)
            for i in range(10):
                arr = (rng.random((48, 48)) * 255).astype("uint8")
                Image.fromarray(arr, "L").save(d / f"i{i}.png")
    return str(root)


def test_inspect_cli_all_toggles(tree, tmp_path):
    from superdiff_tpu.cli.inspect_data import main

    out = str(tmp_path / "inspect")
    rc = main(["--dataset-root", tree, "--out", out,
               "--max-samples", "40",
               "--set", "training.resolution=32",
               "--set", "training.batch_size=8",
               "--set", "viz.show_class_counts=true",
               "--set", "viz.show_batch=true",
               "--set", "viz.show_augmented=true",
               "--set", "viz.histograms=true",
               "--set", "viz.tsne=true",
               "--set", "viz.projection_3d=true"])
    assert rc == 0
    for f in ("batch.png", "augmented.png", "hist.png", "tsne.png",
              "projection3d.png"):
        assert os.path.getsize(os.path.join(out, f)) > 0, f


def test_inspect_cli_gradcam(tree, tmp_path):
    from superdiff_tpu.cli.inspect_data import main

    out = str(tmp_path / "cam")
    rc = main(["--dataset-root", tree, "--out", out,
               "--max-samples", "40",
               "--set", "training.resolution=32",
               "--set", "training.batch_size=8",
               "--set", "viz.gradcam=true"])
    assert rc == 0
    cams = os.listdir(os.path.join(out, "gradcam"))
    assert len(cams) >= 1


@pytest.fixture(scope="module")
def trained_run(tree, tmp_path_factory):
    from superdiff_tpu.training.loop import train

    base = tmp_path_factory.mktemp("runbase")
    cfg = Config()
    cfg.experiment_id, cfg.run_id = "viz", "0"
    cfg.paths.local_base = str(base)
    cfg.training.batch_size = 8
    cfg.training.resolution = 16
    cfg.training.num_epochs = 1
    cfg.training.num_timesteps = 50
    cfg.training.steps_per_epoch = 2
    cfg.training.vis_every = 100
    cfg.model.base_channels = 8
    train(cfg, use_synthetic=True)
    return os.path.join(str(base), "outputs", "PNEUMONIA",
                        "experiment_viz_run_0")


def test_visualize_cli(trained_run, tree, tmp_path):
    from superdiff_tpu.cli.visualize import main

    out = str(tmp_path / "viz")
    rc = main(["--run-dir", trained_run, "--out", out,
               "--num-samples", "4", "--trajectory", "--forward-strip",
               "--tsne"])
    assert rc == 0
    for f in ("generated.png", "trajectory.png", "forward_strip.png",
              "tsne_real_vs_gen.png"):
        assert os.path.getsize(os.path.join(out, f)) > 0, f


def test_visualize_cli_missing_args(trained_run, tmp_path):
    from superdiff_tpu.cli.visualize import main

    rc = main(["--run-dir", trained_run, "--out", str(tmp_path / "x"),
               "--real-vs-generated"])   # needs --dataset-root
    assert rc == 2
    rc = main(["--run-dir", trained_run, "--out", str(tmp_path / "y"),
               "--compare"])             # needs --run-dir2
    assert rc == 2


# ------------------------------------------------------------------ utils --

def test_resolve_paths_layout(tmp_path, monkeypatch):
    monkeypatch.delenv("IS_CLUSTER", raising=False)
    cfg = Config()
    cfg.experiment_id, cfg.run_id, cfg.task = "e1", "r1", "TB"
    cfg.paths.local_base = str(tmp_path)
    paths = resolve_paths(cfg)
    assert paths.output_dir == os.path.join(
        str(tmp_path), "outputs", "TB", "experiment_e1_run_r1")
    assert paths.checkpoint_dir.endswith("checkpoints")
    paths.make_all()
    assert os.path.isdir(paths.tensorboard_dir)


def test_is_cluster_env_flag(monkeypatch):
    from superdiff_tpu.utils.env import is_cluster

    monkeypatch.setenv("IS_CLUSTER", "1")
    assert is_cluster() is True


def test_set_global_seeds_reproducible():
    k1 = set_global_seeds(123)
    n1 = np.random.rand(3)
    k2 = set_global_seeds(123)
    n2 = np.random.rand(3)
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    ml = MetricsLogger(jsonl_path=path)
    ml.log(1, {"loss": 0.5})
    ml.log(2, {"loss": 0.25, "lr": 1e-4})
    ml.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
    assert lines[1]["lr"] == 1e-4


def test_metrics_logger_tensorboard(tmp_path):
    tb_dir = str(tmp_path / "tb")
    ml = MetricsLogger(tensorboard_dir=tb_dir)
    ml.log(1, {"loss": 1.0})
    ml.close()
    assert any(f.startswith("events") for f in os.listdir(tb_dir))


def test_init_logger_writes_file(tmp_path):
    log = init_logger(str(tmp_path), stdout=False)
    log.info("hello from test")
    content = open(os.path.join(str(tmp_path), "training.log")).read()
    assert "hello from test" in content
    # re-init resets handlers (no duplicate lines)
    log = init_logger(str(tmp_path), stdout=False)
    log.info("second")
    content = open(os.path.join(str(tmp_path), "training.log")).read()
    assert content.count("second") == 1


def test_static_dashboard(tree, trained_run, tmp_path):
    """build_static_dashboard must render all three sections into one
    self-contained HTML (no streamlit) with inlined base64 artifacts."""
    from superdiff_tpu.analysis.dashboard import build_static_dashboard

    out = str(tmp_path / "dash" / "dashboard.html")
    path = build_static_dashboard(tree, out, run_dir=trained_run,
                                  num_images=6, max_embed_samples=24)
    text = open(path).read()
    assert "Image grid" in text
    assert "Embedding explorer" in text
    assert "Explainability" in text
    assert text.count("data:image/png;base64,") >= 7  # 6 thumbs + tsne
    assert "loss_curve.png" in text  # run artifact embedded
    assert not os.path.exists(out + ".tsne.png")  # temp cleaned up


def test_dashboard_cli_flag(tree, trained_run, tmp_path):
    from superdiff_tpu.cli.visualize import main

    out = str(tmp_path / "dviz")
    rc = main(["--run-dir", trained_run, "--out", out,
               "--dataset-root", tree, "--dashboard"])
    assert rc == 0
    assert os.path.getsize(os.path.join(out, "dashboard.html")) > 0


# --------------------------------------------- universal display helper ----

def test_to_display_array_layouts():
    """One helper accepts PIL / HW / HWC / CHW / batch-of-1 (the reference's
    universal show_image, src/visualization/images.py:45-101)."""
    from superdiff_tpu.utils.visualization import to_display_array

    hw = np.linspace(-1, 1, 64, dtype=np.float32).reshape(8, 8)
    for arr in (hw, hw[..., None], hw[None, ..., None],
                hw[None, :, :], np.stack([hw] * 3, axis=0)):
        out = to_display_array(arr)
        assert out.shape[:2] == (8, 8)
        assert 0.0 <= out.min() and out.max() <= 1.0 + 1e-6

    pil = Image.fromarray((hw * 127 + 128).astype(np.uint8), "L")
    out = to_display_array(pil)
    assert out.shape == (8, 8)

    with pytest.raises(ValueError):
        to_display_array(np.zeros((2, 3, 4, 5, 6), np.float32))


def test_show_image_writes_png(tmp_path):
    from superdiff_tpu.utils.visualization import show_image

    p = show_image(np.random.default_rng(0).random((16, 16)),
                   path=str(tmp_path / "img.png"), title="t")
    assert os.path.exists(p) and os.path.getsize(p) > 0
