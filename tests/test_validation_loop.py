"""Validation-split wiring: val_loss curves + best-val checkpoint tagging.

The reference's val split is produced by its splitter but never consumed
(``src/train/training_logic.py`` has no eval pass; the TensorBoard writer
of ``src/train.py:58-61`` never receives a scalar). The loop here runs
``make_eval_step`` on the val split every ``training.eval_every`` epochs and
keeps the best-val step in ``<checkpoint_dir>_best`` — the guard that would
have caught the 400-epoch 256² overfit (BASELINE.md) during the run.
"""

import json
import os

from superdiff_tpu.checkpoint import CheckpointManager
from superdiff_tpu.config import Config
from superdiff_tpu.training.loop import train


def _cfg(tmp_path, epochs=3):
    cfg = Config()
    cfg.experiment_id, cfg.run_id = "v", "0"
    cfg.paths.local_base = str(tmp_path)
    cfg.training.batch_size = 8
    cfg.training.resolution = 16
    cfg.training.num_epochs = epochs
    cfg.training.num_timesteps = 50
    cfg.training.steps_per_epoch = 2
    cfg.training.vis_every = 100
    cfg.training.eval_every = 1
    cfg.training.eval_batches = 1
    cfg.model.preset = "small64"
    cfg.model.base_channels = 8
    cfg.model.num_classes = 2
    return cfg


def test_val_loss_logged_and_best_checkpoint_tagged(tmp_path):
    cfg = _cfg(tmp_path)
    summary = train(cfg, use_synthetic=True)
    out = os.path.join(str(tmp_path), "outputs", "PNEUMONIA",
                       "experiment_v_run_0")

    # val curve reaches the metrics sink
    vals = {}
    with open(os.path.join(out, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "val_loss" in rec:
                vals[rec["step"]] = rec["val_loss"]
    assert len(vals) == 3, vals

    # the tagged best step is the argmin of the logged val curve
    best_step = min(vals, key=vals.get)
    with open(os.path.join(out, "best_val.json")) as f:
        tagged = json.load(f)
    assert tagged["step"] == best_step
    assert abs(tagged["val_loss"] - vals[best_step]) < 1e-9
    assert summary["best_val_step"] == best_step
    assert summary["best_val_loss"] == vals[best_step]

    # a val regression never evicts the best checkpoint: the _best manager
    # holds exactly the argmin step even when later epochs regressed
    best_dir = os.path.join(out, "checkpoints_best")
    assert os.path.isdir(best_dir)
    mngr = CheckpointManager(best_dir, max_to_keep=1)
    assert mngr.latest_step() == best_step
    mngr.close()


def test_zero_periods_disable_not_crash(tmp_path):
    """vis_every=0 / save_every=0 / log_every=0 mean "never", not
    ZeroDivisionError mid-epoch (round-3 regression: the crash also
    stranded the in-flight Orbax save as an unreadable tmp dir)."""
    cfg = _cfg(tmp_path, epochs=1)
    cfg.training.vis_every = 0
    cfg.training.log_every = 0
    summary = train(cfg, use_synthetic=True)
    assert summary["steps"] == 2
    # the final forced save must be finalized and restorable
    out = os.path.join(str(tmp_path), "outputs", "PNEUMONIA",
                       "experiment_v_run_0")
    mngr = CheckpointManager(os.path.join(out, "checkpoints"))
    assert mngr.latest_step() == 2


def test_writers_finalized_when_loop_raises(tmp_path, monkeypatch):
    """An exception mid-loop (NaN debug, OOM, data error) must still
    finalize async Orbax writes — otherwise every checkpoint saved this
    run is a *.orbax-checkpoint-tmp dir that restore() can't read."""
    import superdiff_tpu.training.loop as loop_mod

    cfg = _cfg(tmp_path, epochs=3)
    cfg.training.save_every = 1
    cfg.training.vis_every = 2    # crash in epoch 2, after epoch 2's save

    def boom(*a, **k):
        raise RuntimeError("injected visualization failure")

    monkeypatch.setattr(loop_mod, "save_real_vs_generated", boom)
    try:
        loop_mod.train(cfg, use_synthetic=True)
        raised = False
    except RuntimeError:
        raised = True
    assert raised
    out = os.path.join(str(tmp_path), "outputs", "PNEUMONIA",
                       "experiment_v_run_0")
    # epoch saves before the crash must be committed (readable), not tmp
    mngr = CheckpointManager(os.path.join(out, "checkpoints"))
    assert mngr.latest_step() is not None
    leftovers = [d for d in os.listdir(os.path.join(out, "checkpoints"))
                 if d.endswith("-tmp")]
    assert not leftovers, leftovers


def test_eval_disabled(tmp_path):
    cfg = _cfg(tmp_path, epochs=1)
    cfg.training.eval_every = 0
    summary = train(cfg, use_synthetic=True)
    out = os.path.join(str(tmp_path), "outputs", "PNEUMONIA",
                       "experiment_v_run_0")
    assert "best_val_loss" not in summary
    assert not os.path.exists(os.path.join(out, "checkpoints_best"))
    with open(os.path.join(out, "metrics.jsonl")) as f:
        assert not any("val_loss" in json.loads(l) for l in f)


def test_load_run_best(tmp_path):
    """``load_run(best=True)`` restores from the tagged best-val step."""
    from superdiff_tpu.inference import load_run

    cfg = _cfg(tmp_path, epochs=2)
    train(cfg, use_synthetic=True)
    out = os.path.join(str(tmp_path), "outputs", "PNEUMONIA",
                       "experiment_v_run_0")
    cfg2, model, schedule, ema = load_run(out, best=True)
    assert ema is not None
    with open(os.path.join(out, "best_val.json")) as f:
        tagged = json.load(f)
    assert tagged["step"] in (2, 4)


def test_val_split_smaller_than_batch_still_validates(tmp_path):
    """A val split with fewer images than training.batch_size used to be
    silently dropped (every batch was a partial tail), disabling val curves
    and best-val tagging; the loop now wrap-pads the tail to one compiled
    shape."""
    import numpy as np
    from PIL import Image

    root = tmp_path / "xray"
    for split, n in (("train", 8), ("val", 3), ("test", 3)):
        for cls in ["NORMAL", "PNEUMONIA"]:
            d = root / "PNEUMONIA" / split / cls
            d.mkdir(parents=True)
            rng = np.random.default_rng(hash((split, cls)) % 2**32)
            for i in range(n):
                Image.fromarray(
                    (rng.random((20, 20)) * 255).astype("uint8"), "L"
                ).save(d / f"img{i}.png")

    cfg = _cfg(tmp_path, epochs=2)
    cfg.training.batch_size = 8      # > 6 val images (3 per class)
    train(cfg, dataset_root=str(root))
    out = os.path.join(str(tmp_path), "outputs", "PNEUMONIA",
                       "experiment_v_run_0")
    vals = [json.loads(l)["val_loss"] for l in open(
        os.path.join(out, "metrics.jsonl")) if "val_loss" in l]
    assert len(vals) == 2 and all(v > 0 for v in vals)
    with open(os.path.join(out, "best_val.json")) as f:
        assert json.load(f)["step"] > 0


def test_best_save_deferred_while_write_in_flight(tmp_path, monkeypatch):
    """Best-val writes must never serialize training: when the previous
    async best save is still being written, the improvement is skipped —
    and because the write gate compares against the *tagged* value (not
    best seen), a later state better than the tag still gets written.

    Scripted val curve 3.0 -> 1.0 -> 2.0 with the 1.0 write "in flight":
    the tag must land on 2.0 (the best achievable after the miss), and
    best_val.json / summary must describe that tagged checkpoint."""
    import jax.numpy as jnp

    from superdiff_tpu.training import loop as loop_mod

    scripted = iter([3.0, 1.0, 2.0])

    def fake_make_eval_step(*a, **k):
        def eval_fn(state, batch):
            return jnp.asarray(next(scripted))
        return eval_fn

    monkeypatch.setattr(loop_mod, "make_eval_step", fake_make_eval_step)

    in_flight = iter([False, True, False])   # one probe per improvement
    monkeypatch.setattr(CheckpointManager, "saving_in_progress",
                        lambda self: next(in_flight))

    cfg = _cfg(tmp_path, epochs=3)
    summary = train(cfg, use_synthetic=True)
    out = os.path.join(str(tmp_path), "outputs", "PNEUMONIA",
                       "experiment_v_run_0")

    with open(os.path.join(out, "best_val.json")) as f:
        tagged = json.load(f)
    assert tagged["val_loss"] == 2.0          # not the missed 1.0, not 3.0
    assert tagged["epoch"] == 3
    assert summary["best_val_loss"] == 2.0
    assert summary["best_val_step"] == tagged["step"]

    # the _best manager holds exactly the tagged step
    best = CheckpointManager(os.path.join(out, "checkpoints_best"),
                             max_to_keep=1)
    assert best.latest_step() == tagged["step"]
    best.close()

    # the metrics curve still tracks best *seen* (1.0), independent of tags
    curve = [json.loads(l)["best_val_loss"] for l in open(
        os.path.join(out, "metrics.jsonl")) if "best_val_loss" in l]
    assert curve == [3.0, 1.0, 1.0]
