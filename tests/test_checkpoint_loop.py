"""Checkpoint/resume, training loop, and CLI round-trip tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superdiff_tpu.checkpoint import CheckpointManager
from superdiff_tpu.config import Config
from superdiff_tpu.diffusion import make_schedule
from superdiff_tpu.models import CondUNet
from superdiff_tpu.training import create_train_state, make_train_step
from superdiff_tpu.training.loop import train
from superdiff_tpu.data import synthetic_xray_batch


def _tiny_state(seed=0):
    model = CondUNet(base_channels=8, channel_mults=(1, 2),
                     num_res_blocks=1, attn_resolutions=(),
                     num_classes=2, time_emb_dim=16, groups=4)
    x = jnp.zeros((4, 16, 16, 1))
    t = jnp.zeros((4,), dtype=jnp.int32)
    y = jnp.zeros((4,), dtype=jnp.int32)
    return model, create_train_state(model, jax.random.PRNGKey(seed),
                                     (x, t, y))


def _batch(seed=0):
    imgs, labels = synthetic_xray_batch(4, 16, seed=seed)
    return {"image": jnp.asarray(imgs), "label": jnp.asarray(labels)}


def test_checkpoint_roundtrip(tmp_path):
    model, state = _tiny_state()
    schedule = make_schedule(50)
    step = make_train_step(schedule, conditional=True)
    for i in range(3):
        state, _ = step(state, _batch(i))
    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mngr.save(state)
    mngr.wait()
    assert mngr.latest_step() == 3

    _, fresh = _tiny_state(seed=99)   # different init
    restored = mngr.restore(fresh)
    assert int(restored.step) == 3
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mngr.close()


def test_checkpoint_resume_bit_exact(tmp_path):
    """save at step 2, run to 4; restore at 2 and rerun -> identical."""
    model, state = _tiny_state()
    schedule = make_schedule(50)
    step = make_train_step(schedule, conditional=True)
    state, _ = step(state, _batch(0))
    state, _ = step(state, _batch(1))
    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    mngr.save(state)
    mngr.wait()
    state_a = state
    state_a, _ = step(state_a, _batch(2))
    state_a, _ = step(state_a, _batch(3))

    _, fresh = _tiny_state(seed=7)
    state_b = mngr.restore(fresh)
    state_b, _ = step(state_b, _batch(2))
    state_b, _ = step(state_b, _batch(3))
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mngr.close()


def test_checkpoint_keep_last_n(tmp_path):
    model, state = _tiny_state()
    schedule = make_schedule(50)
    step = make_train_step(schedule, conditional=True)
    mngr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    for i in range(4):
        state, _ = step(state, _batch(i))
        mngr.save(state)
    mngr.wait()
    assert mngr.latest_step() == 4
    kept = sorted(int(d) for d in os.listdir(tmp_path / "ckpt")
                  if d.isdigit())
    assert len(kept) <= 2
    mngr.close()


def test_restore_without_checkpoint_raises(tmp_path):
    _, state = _tiny_state()
    mngr = CheckpointManager(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        mngr.restore(state)
    mngr.close()


def _smoke_cfg(tmp_path, epochs=2):
    cfg = Config()
    cfg.experiment_id, cfg.run_id = "t", "0"
    cfg.paths.local_base = str(tmp_path)
    cfg.training.batch_size = 8
    cfg.training.resolution = 16
    cfg.training.num_epochs = epochs
    cfg.training.num_timesteps = 50
    cfg.training.steps_per_epoch = 2
    cfg.training.vis_every = 2
    cfg.model.preset = "small64"
    cfg.model.base_channels = 8
    cfg.model.num_classes = 2
    return cfg


def test_train_loop_synthetic_end_to_end(tmp_path):
    cfg = _smoke_cfg(tmp_path)
    summary = train(cfg, use_synthetic=True)
    assert summary["steps"] == 4
    out = os.path.join(str(tmp_path), "outputs", "PNEUMONIA",
                       "experiment_t_run_0")
    assert os.path.exists(os.path.join(out, "config.yaml"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    assert os.path.exists(os.path.join(out, "loss_curve.png"))
    assert os.path.exists(os.path.join(out, "samples_epoch2.png"))
    assert os.path.isdir(os.path.join(out, "checkpoints"))


def test_train_loop_resumes(tmp_path):
    cfg = _smoke_cfg(tmp_path, epochs=1)
    s1 = train(cfg, use_synthetic=True)
    assert s1["steps"] == 2
    cfg2 = _smoke_cfg(tmp_path, epochs=2)
    s2 = train(cfg2, use_synthetic=True)   # resumes from step 2
    assert s2["steps"] == 4


def test_sample_cli_from_trained_run(tmp_path):
    cfg = _smoke_cfg(tmp_path, epochs=1)
    train(cfg, use_synthetic=True)
    run_dir = os.path.join(str(tmp_path), "outputs", "PNEUMONIA",
                           "experiment_t_run_0")
    from superdiff_tpu.cli.sample import main as sample_main
    out_dir = str(tmp_path / "samples")
    rc = sample_main(["--run-dir", run_dir, "--method", "ddim",
                      "--num-steps", "5", "--batch-size", "2",
                      "--out", out_dir])
    assert rc == 0
    assert os.path.exists(os.path.join(out_dir, "batch0.png"))
    stack = np.load(os.path.join(out_dir, "samples.npy"))
    assert stack.shape == (2, 16, 16, 1)
    assert np.isfinite(stack).all()

    # --data-parallel: shard the batch over all (8 virtual CPU) devices
    dp_dir = str(tmp_path / "samples_dp")
    rc = sample_main(["--run-dir", run_dir, "--method", "ddim",
                      "--num-steps", "5", "--batch-size", "8",
                      "--data-parallel", "--out", dp_dir])
    assert rc == 0
    dp = np.load(os.path.join(dp_dir, "samples.npy"))
    assert dp.shape == (8, 16, 16, 1) and np.isfinite(dp).all()

    # batch size not divisible by device count must be rejected
    import pytest, jax
    if len(jax.devices()) > 1:
        with pytest.raises(ValueError, match="divisible"):
            sample_main(["--run-dir", run_dir, "--batch-size", "3",
                         "--data-parallel", "--out", dp_dir])


def test_superdiff_cli_two_runs(tmp_path):
    cfg = _smoke_cfg(tmp_path, epochs=1)
    train(cfg, use_synthetic=True)
    cfg2 = _smoke_cfg(tmp_path, epochs=1)
    cfg2.run_id = "1"
    cfg2.task = "TB"
    train(cfg2, use_synthetic=True)
    base = os.path.join(str(tmp_path), "outputs")
    run1 = os.path.join(base, "PNEUMONIA", "experiment_t_run_0")
    run2 = os.path.join(base, "TB", "experiment_t_run_1")
    from superdiff_tpu.cli.sample import main as sample_main
    out_dir = str(tmp_path / "superposed")
    rc = sample_main(["--run-dir", run1, "--run-dir2", run2,
                      "--mode", "or", "--batch-size", "2",
                      "--out", out_dir])
    assert rc == 0
    stack = np.load(os.path.join(out_dir, "samples.npy"))
    assert stack.shape == (2, 16, 16, 1)

    # compare_runs success path (panel + per-model densities) on the same
    # pair — params enter its jits as arguments (remote-compile size limit)
    from superdiff_tpu.analysis.compare import compare_runs

    res = compare_runs(run1, run2, str(tmp_path / "cmp"), num_samples=2)
    assert os.path.getsize(res["panel"]) > 0
    assert np.isfinite(res["mean_logq_gap"])
    assert len(res["logq_model_a"]) == 2


def test_export_then_sample_from_artifact(tmp_path):
    """Export CLI -> compact npz artifact -> load_run + sample CLI work on
    it without any Orbax checkpoint present."""
    cfg = _smoke_cfg(tmp_path, epochs=1)
    train(cfg, use_synthetic=True)
    run_dir = os.path.join(str(tmp_path), "outputs", "PNEUMONIA",
                           "experiment_t_run_0")
    from superdiff_tpu.cli.export import main as export_main
    art = str(tmp_path / "artifact")
    assert export_main(["--run-dir", run_dir, "--out", art]) == 0
    assert os.path.exists(os.path.join(art, "ema_params.npz"))
    assert os.path.exists(os.path.join(art, "config.yaml"))

    # exported params match the checkpoint's EMA exactly (float32 export)
    from superdiff_tpu.inference import load_run
    _, _, _, ema_ckpt = load_run(run_dir)
    _, _, _, ema_art = load_run(art)
    for a, b in zip(jax.tree_util.tree_leaves(ema_ckpt),
                    jax.tree_util.tree_leaves(ema_art)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    from superdiff_tpu.cli.sample import main as sample_main
    out_dir = str(tmp_path / "art_samples")
    rc = sample_main(["--run-dir", art, "--method", "ddim",
                      "--num-steps", "5", "--batch-size", "2",
                      "--out", out_dir])
    assert rc == 0
    stack = np.load(os.path.join(out_dir, "samples.npy"))
    assert stack.shape == (2, 16, 16, 1) and np.isfinite(stack).all()

    # --step is meaningless on a single-snapshot artifact -> clear error
    import pytest
    with pytest.raises(ValueError, match="exported"):
        load_run(art, step=0)

    # bfloat16 export must round-trip (npz can't serialize ml_dtypes
    # bfloat16 directly; stored as uint16 bit patterns)
    art16 = str(tmp_path / "artifact_bf16")
    assert export_main(["--run-dir", run_dir, "--out", art16,
                        "--dtype", "bfloat16"]) == 0
    _, _, _, ema_bf = load_run(art16)
    for a, b in zip(jax.tree_util.tree_leaves(ema_ckpt),
                    jax.tree_util.tree_leaves(ema_bf)):
        assert b.dtype == np.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-2)


def test_superpose_compat_check():
    """Schedule mismatch between runs must be rejected, not silently mixed
    with run 1's sigmas (advisor finding)."""
    import pytest
    from superdiff_tpu.config import Config
    from superdiff_tpu.inference import check_superpose_compat

    a, b = Config(), Config()
    check_superpose_compat(a, b)  # identical: fine
    b.training.beta_end = 0.05
    with pytest.raises(ValueError, match="beta schedules"):
        check_superpose_compat(a, b)
    b = Config()
    b.training.schedule = "cosine"
    with pytest.raises(ValueError, match="beta schedules"):
        check_superpose_compat(a, b)
    b = Config()
    b.training.num_timesteps = 123
    with pytest.raises(ValueError, match="different T"):
        check_superpose_compat(a, b)


def test_train_cli_parser():
    from superdiff_tpu.cli.train import build_parser
    args = build_parser().parse_args(
        ["--dataset", "TB", "--set", "training.batch_size=4",
         "--synthetic"])
    assert args.dataset == "TB"
    assert args.overrides == ["training.batch_size=4"]
    assert args.synthetic


def test_train_loop_graceful_stop_and_resume(tmp_path):
    """Preemption path: stop hook triggers a force-save + clean return,
    and a fresh train() resumes from the saved step."""
    cfg = _smoke_cfg(tmp_path, epochs=3)
    calls = {"n": 0}

    def stop_after_3_steps():
        calls["n"] += 1
        return calls["n"] >= 3

    s = train(cfg, use_synthetic=True, should_stop=stop_after_3_steps)
    assert s["stopped_early"] == 1.0
    assert 0 < s["steps"] < 6
    saved = s["steps"]
    cfg2 = _smoke_cfg(tmp_path, epochs=3)
    s2 = train(cfg2, use_synthetic=True)
    # resume is epoch-granular: a mid-epoch stop replays the interrupted
    # epoch, so the final step count is >= the uninterrupted total.
    assert s2["steps"] >= 6
    assert s2["stopped_early"] == 0.0
    assert s2["steps"] > saved


def test_train_loop_profile_steps(tmp_path):
    cfg = _smoke_cfg(tmp_path, epochs=1)
    cfg.logging.profile_steps = 1
    train(cfg, use_synthetic=True)
    prof = os.path.join(str(tmp_path), "outputs", "PNEUMONIA",
                        "experiment_t_run_0", "profile")
    found = []
    for root, _, files in os.walk(prof):
        found.extend(files)
    assert found, "profiler wrote nothing"
