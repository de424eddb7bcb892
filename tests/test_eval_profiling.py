"""Evaluate CLI, profiling utils, and launch-script validation tests."""

import json
import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superdiff_tpu.config import Config
from superdiff_tpu.utils.profiling import timed, trace

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    from superdiff_tpu.training.loop import train

    base = tmp_path_factory.mktemp("evalbase")
    cfg = Config()
    cfg.experiment_id, cfg.run_id = "ev", "0"
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
                        "experiment_ev_run_0")


@pytest.fixture(scope="module")
def tree16(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("evtree")
    rng = np.random.default_rng(0)
    for cls in ("NORMAL", "PNEUMONIA"):
        d = root / "PNEUMONIA" / "test" / cls
        d.mkdir(parents=True)
        for i in range(8):
            arr = (rng.random((16, 16)) * 255).astype("uint8")
            Image.fromarray(arr, "L").save(d / f"i{i}.png")
    return str(root)


def test_evaluate_cli_fid_and_stats(trained_run, tree16, tmp_path):
    from superdiff_tpu.cli.evaluate import main

    out = str(tmp_path / "eval.json")
    rc = main(["--run-dir", trained_run, "--dataset-root", tree16,
               "--num-samples", "8", "--batch-size", "8",
               "--method", "ddim", "--num-steps", "5", "--out", out])
    assert rc == 0
    res = json.load(open(out))
    assert res["num_generated"] == 8
    assert np.isfinite(res["fid"]) and res["fid"] >= 0
    assert "sample_mean" in res


def test_evaluate_cli_shared_pretrained_extractor(trained_run, tree16,
                                                  tmp_path):
    """--extractor resnet18 + --extractor-checkpoint gives a feature space
    shared across runs (cross-run-comparable FID)."""
    import sys

    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_analysis import _fake_torchvision_resnet18_state_dict

    from superdiff_tpu.cli.evaluate import main

    sd = _fake_torchvision_resnet18_state_dict(seed=7)
    ckpt = str(tmp_path / "r18.pt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               ckpt)
    out = str(tmp_path / "eval3.json")
    rc = main(["--run-dir", trained_run, "--dataset-root", tree16,
               "--num-samples", "8", "--batch-size", "8",
               "--method", "ddim", "--num-steps", "5",
               "--extractor", "resnet18", "--extractor-checkpoint", ckpt,
               "--out", out])
    assert rc == 0
    res = json.load(open(out))
    assert res["fid_extractor"] == "resnet18"
    assert np.isfinite(res["fid"]) and res["fid"] >= 0


def test_evaluate_cli_superdiff_logq(trained_run, tmp_path):
    from superdiff_tpu.cli.evaluate import main

    out = str(tmp_path / "eval2.json")
    rc = main(["--run-dir", trained_run, "--run-dir2", trained_run,
               "--num-samples", "4", "--batch-size", "4",
               "--method", "ddim", "--num-steps", "5", "--out", out])
    assert rc == 0
    res = json.load(open(out))
    sd = res["superdiff"]
    # identical models: densities must agree
    assert abs(sd["logq_gap_mean"]) < 1.0
    assert np.isfinite(sd["logq_model1_mean"])


def test_timed_helper():
    f = jax.jit(lambda x: x * 2 + 1)
    dt, result = timed(f, jnp.ones((64, 64)), warmup=1, iters=2)
    assert dt > 0
    assert float(result[0, 0]) == 3.0


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "prof")
    with trace(d):
        jax.jit(lambda x: x @ x)(jnp.ones((128, 128))).block_until_ready()
    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert found, "no profiler output written"


def test_launch_train_arg_validation():
    script = os.path.join(REPO, "scripts", "launch_train.sh")
    r = subprocess.run([script, "-e", "e1"], capture_output=True, text=True)
    assert r.returncode == 2
    assert "required" in r.stderr
    r = subprocess.run([script, "-e", "e", "-r", "r", "-d", "COVID"],
                       capture_output=True, text=True)
    assert r.returncode == 2
    assert "TB or PNEUMONIA" in r.stderr


def test_bench_flop_count_positive():
    """bench.py's HLO-cost FLOP counter must report real FLOPs for a model
    whose TPU path uses Pallas (attention at S>=1024 triggers the kernel;
    the counter lowers with kernels disabled — identical math)."""
    import sys

    sys.path.insert(0, REPO)
    from bench import denoiser_flops
    from superdiff_tpu.models import CondUNet

    model = CondUNet(base_channels=8, channel_mults=(1, 2),
                     num_res_blocks=1, attn_resolutions=(8,), num_heads=2,
                     num_classes=2, time_emb_dim=16, groups=4)
    B, R = 2, 16
    x = jnp.zeros((B, R, R, 1))
    t0 = jnp.zeros((B,), jnp.int32)
    y = jnp.zeros((B,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t0, y)
    flops = denoiser_flops(model, params, x, t0, y)
    # at least the stem+attention matmul FLOPs; exact value backend-defined
    assert flops > 1e6, flops
    assert os.environ.get("SUPERDIFF_TPU_DISABLE_PALLAS") is None


def test_submit_tpu_job_dry_run():
    """The queued-resource submission script (the reference's sbatch analogue,
    ``src/scripts/jobs/submit_experiment.sh``) plans accelerator autoselect +
    pod handoff without needing gcloud, via --dry-run."""
    script = os.path.join(REPO, "scripts", "submit_tpu_job.sh")

    r = subprocess.run([script, "--experiment", "1"],
                       capture_output=True, text=True)
    assert r.returncode == 1 and "usage" in r.stderr

    r = subprocess.run([script, "--experiment", "1", "--run", "3",
                        "--dataset", "COVID"], capture_output=True, text=True)
    assert r.returncode == 1 and "TB or PNEUMONIA" in r.stderr

    r = subprocess.run(
        [script, "--experiment", "1", "--run", "3", "--dataset", "TB",
         "--dry-run", "--", "--set", "training.num_epochs=2"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    out = r.stdout
    # first-fit preference list, like the reference's choose_partition()
    assert out.index("v5litepod-8") < out.index("v5litepod-4") < out.index("v4-8")
    assert "queued-resources create superdiff-e1-r3" in out
    assert "tpu_pod_run.sh superdiff-e1-r3" in out
    assert "launch_train.sh -e 1 -r 3 -d TB" in out
    assert "training.num_epochs=2" in out


def test_evaluate_cli_guided_conditional(trained_run, tree16, tmp_path):
    """--guidance samples class-conditionally with CFG (balanced labels);
    the results record the conditioning so eval JSONs are self-describing."""
    from superdiff_tpu.cli.evaluate import main

    out = str(tmp_path / "eval_g.json")
    rc = main(["--run-dir", trained_run, "--dataset-root", tree16,
               "--num-samples", "8", "--batch-size", "8",
               "--method", "ddim", "--num-steps", "5",
               "--guidance", "2.0", "--out", out])
    assert rc == 0
    res = json.load(open(out))
    assert res["guidance"] == 2.0 and res["labels"] == "balanced"
    assert np.isfinite(res["fid"])

    # guidance on an unconditional-labels run differs from the null path
    out2 = str(tmp_path / "eval_null.json")
    main(["--run-dir", trained_run, "--dataset-root", tree16,
          "--num-samples", "8", "--batch-size", "8",
          "--method", "ddim", "--num-steps", "5", "--out", out2])
    res2 = json.load(open(out2))
    assert res2["labels"] == "null" and res2["guidance"] == 1.0
    assert res2["sample_mean"] != res["sample_mean"]


def test_evaluate_cli_multi_extractor_single_pass(trained_run, tree16,
                                                  tmp_path):
    """--extractor a,b,c samples ONCE and scores each feature space (the
    round-5 amortization: one remote sampler compile per run instead of
    one per extractor). Per-extractor checkpoints pair as NAME=PATH; the
    single-extractor fields stay for downstream parsers."""
    import jax

    from superdiff_tpu.analysis.features import SmallCNN, save_classifier
    from superdiff_tpu.cli.evaluate import main

    clf = SmallCNN(num_classes=3, widths=(4, 8))
    p = clf.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
    ckpt = str(tmp_path / "clf.npz")
    save_classifier(ckpt, jax.device_get(p), (4, 8), 3)

    out = str(tmp_path / "evalm.json")
    rc = main(["--run-dir", trained_run, "--dataset-root", tree16,
               "--num-samples", "8", "--batch-size", "8",
               "--method", "ddim", "--num-steps", "5",
               "--extractor", "random,classifier",
               "--extractor-checkpoint", f"classifier={ckpt}",
               "--out", out])
    assert rc == 0
    res = json.load(open(out))
    fids = res["fid_by_extractor"]
    assert set(fids) == {"random", "classifier"}
    assert all(np.isfinite(v) and v >= 0 for v in fids.values())
    # back-compat: fid/fid_extractor mirror the first listed space
    assert res["fid"] == fids["random"]
    assert res["fid_extractor"] == "random"


def test_evaluate_cli_rejects_unknown_extractor(trained_run, tree16,
                                                tmp_path):
    import pytest as _pytest

    from superdiff_tpu.cli.evaluate import main

    with _pytest.raises(SystemExit, match="unknown extractor"):
        main(["--run-dir", trained_run, "--dataset-root", tree16,
              "--num-samples", "8", "--batch-size", "8",
              "--method", "ddim", "--num-steps", "5",
              "--extractor", "random,bogus",
              "--out", str(tmp_path / "x.json")])
