"""The training engine: epoch loop, metrics, checkpoints, periodic samples.

Capability of ``src/train/training_logic.py:13-71`` rebuilt TPU-first:
- one jitted, donated, mesh-sharded train step (vs per-batch Python autograd)
- EMA maintained inside the step (vs host-side ema-pytorch wrapper)
- Orbax checkpoints of the full state with resume (vs save-only state_dicts)
- metrics actually reach jsonl/TensorBoard/wandb (vs dangling writers)
- every ``vis_every`` epochs: EMA-sampled images vs real batch PNG
  (reference behavior, ``training_logic.py:50-61``), plus a loss curve at
  the end (``:64-71``).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from superdiff_tpu.checkpoint import CheckpointManager
from superdiff_tpu.config import Config, save_config
from superdiff_tpu.data.datamodule import DataModule
from superdiff_tpu.data.synthetic import synthetic_xray_batch
from superdiff_tpu.data.transforms import prepare_batch
from superdiff_tpu.diffusion import make_schedule, ddpm_sample, ddim_sample
from superdiff_tpu.models.presets import (
    model_from_config, preset_for_resolution)
from superdiff_tpu.parallel import make_mesh, shard_batch
from superdiff_tpu.training.state import create_train_state, make_optimizer
from superdiff_tpu.training.steps import make_eval_step, make_train_step
from superdiff_tpu.utils.env import resolve_paths, set_global_seeds
from superdiff_tpu.utils.logger import init_logger
from superdiff_tpu.utils.metrics import MetricsLogger
from superdiff_tpu.utils.visualization import (
    save_loss_curve, save_real_vs_generated)

logger = logging.getLogger("superdiff_tpu")


def _synthetic_batches(cfg: Config, epoch: int, augmentation: str = None
                       ) -> Iterator[Dict[str, jnp.ndarray]]:
    """Synthetic data path for smoke runs / missing datasets.

    ``augmentation`` overrides the training tier (validation passes
    ``"none"`` — validation sees clean data, matching the real-data path).
    """
    t = cfg.training
    aug = t.augmentation if augmentation is None else augmentation
    steps = t.steps_per_epoch or 4
    for i in range(steps):
        imgs, labels = synthetic_xray_batch(
            t.batch_size, t.resolution, num_classes=cfg.model.num_classes,
            seed=epoch * 10_000 + i, normalization="minmax")
        rng = jax.random.PRNGKey(epoch * 10_000 + i)
        image = prepare_batch(
            jnp.asarray((imgs * 255).astype(np.uint8)), rng,
            augmentation=aug, normalization=t.normalization)
        yield {"image": image, "label": jnp.asarray(labels)}


def train(cfg: Config,
          dataset_root: Optional[str] = None,
          resume: bool = True,
          use_synthetic: bool = False,
          should_stop=None) -> Dict[str, float]:
    """Run training per config; returns summary metrics.

    ``dataset_root`` overrides the resolved dataset path; when the dataset
    is missing and ``use_synthetic``, the synthetic generator stands in
    (CI/smoke mode).

    Preemption safety (SURVEY.md §5.3 — the reference loses all in-flight
    state on its SLURM wall kill): SIGTERM/SIGINT request a graceful stop —
    the loop finishes the current step, force-saves a checkpoint, and
    returns; the launcher's restart loop then resumes from it. A custom
    ``should_stop() -> bool`` hook composes with the signal path (tests,
    schedulers).

    Profiling (§5.1): ``logging.profile_steps = N`` traces steps 2..2+N of
    the first epoch into ``<output>/profile/`` (TensorBoard-readable).
    """
    t = cfg.training
    if not cfg.model.preset:
        cfg.model.preset = preset_for_resolution(t.resolution)
    paths = resolve_paths(cfg).make_all()
    init_logger(paths.log_dir, stdout=cfg.logging.stdout)
    save_config(cfg, os.path.join(paths.output_dir, "config.yaml"))
    root_key = set_global_seeds(t.seed)

    # data
    dm: Optional[DataModule] = None
    root = dataset_root or paths.dataset_dir
    if not use_synthetic:
        dm = DataModule(cfg, root)
        dm.index("train")  # fail fast if the tree is missing
    steps_per_epoch = (t.steps_per_epoch if t.steps_per_epoch
                       else (len(dm.iterator("train", epoch=0)) if dm else 4))

    # model + schedule + state
    schedule = make_schedule(t.num_timesteps, kind=t.schedule,
                             beta_start=t.beta_start, beta_end=t.beta_end)
    model = model_from_config(cfg)
    conditional = cfg.model.conditional

    B, R = t.batch_size, t.resolution
    x0 = jnp.zeros((B, R, R, 1))
    t0 = jnp.zeros((B,), dtype=jnp.int32)
    sample_args = ((x0, t0, jnp.zeros((B,), dtype=jnp.int32))
                   if conditional else (x0, t0))
    tx = make_optimizer(
        learning_rate=t.learning_rate, weight_decay=t.weight_decay,
        grad_clip_norm=t.grad_clip_norm, warmup_steps=t.warmup_steps,
        total_steps=steps_per_epoch * t.num_epochs,
        schedule=t.lr_schedule)
    state = create_train_state(model, root_key, sample_args, tx=tx,
                               ema_decay=t.ema_decay)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(state.params))
    logger.info("model %s: %s params", cfg.model.preset, f"{n_params:,}")

    # mesh: shard over all local devices when >1
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    if mesh is not None and B % n_dev:
        raise ValueError(f"batch_size {B} not divisible by {n_dev} devices")
    parameterization = getattr(cfg.model, "parameterization", "eps")
    step_fn = make_train_step(schedule, mesh=mesh, conditional=conditional,
                              cfg_drop_prob=t.cfg_drop_prob,
                              null_label=getattr(model, "null_label", 0),
                              loss_type=t.loss_type,
                              weighting=t.loss_weighting,
                              min_snr_gamma=t.min_snr_gamma,
                              augmentation=t.augmentation,
                              normalization=t.normalization,
                              parameterization=parameterization,
                              grad_accum=getattr(t, "grad_accum", 1))

    # validation: EMA loss on the val split every eval_every epochs; the
    # best-val step is checkpointed separately so a late-training regression
    # (e.g. the 400-epoch 256² overfit, BASELINE.md) never evicts the best
    # model. Closes the intent of the reference's dangling writers
    # (src/train.py:58-61 creates a SummaryWriter that never sees a scalar).
    eval_fn = make_eval_step(schedule, mesh=mesh, conditional=conditional,
                             loss_type=t.loss_type,
                             weighting=t.loss_weighting,
                             min_snr_gamma=t.min_snr_gamma,
                             normalization=t.normalization,
                             parameterization=parameterization) \
        if t.eval_every > 0 else None

    def _val_batches():
        """Fixed-content validation stream (constant seed -> the same
        batches every pass, so val curves are comparable across epochs)."""
        if dm is not None:
            try:
                dm.index("val")
            except (FileNotFoundError, ValueError):
                return None
            # raw uint8, normalized inside the eval jit (fused pipeline,
            # same as training); epoch=0 pins a fixed deterministic stream
            # so val curves stay comparable across passes
            return ({"image": jnp.asarray(b["image"]),
                     "label": jnp.asarray(b["label"])}
                    for b in dm.iterator("val", epoch=0))
        return _synthetic_batches(cfg, epoch=1_000_003, augmentation="none")

    def run_validation() -> Optional[float]:
        batches = _val_batches()
        if batches is None:
            return None
        losses = []
        for j, vb in enumerate(batches):
            if t.eval_batches and j >= t.eval_batches:
                break
            n = int(vb["image"].shape[0])
            if n != B:
                # Wrap-pad the partial tail up to B so one compiled shape
                # serves every pass — and so a val split *smaller* than the
                # train batch still produces a val curve at all (a tiny
                # split used to silently disable validation and best-val
                # tagging). The duplicates are deterministic (constant val
                # stream seed), so curves stay comparable across epochs.
                reps = -(-B // n)
                vb = {k: jnp.tile(v, (reps,) + (1,) * (v.ndim - 1))[:B]
                      for k, v in vb.items()}
            if mesh is not None:
                vb = shard_batch(vb, mesh)
            if not conditional:
                vb = {"image": vb["image"]}
            losses.append(eval_fn(state, vb))
        if not losses:
            return None
        return float(np.mean(jax.device_get(losses)))

    # checkpointing / resume
    ckpt = CheckpointManager(paths.checkpoint_dir,
                             max_to_keep=t.keep_checkpoints)
    start_epoch = 0
    if resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        start_epoch = int(state.step) // max(steps_per_epoch, 1)
        logger.info("resumed from step %d (epoch %d)", int(state.step),
                    start_epoch)

    metrics_log = MetricsLogger(
        jsonl_path=os.path.join(paths.output_dir, "metrics.jsonl")
        if cfg.logging.use_jsonl else None,
        tensorboard_dir=paths.tensorboard_dir
        if cfg.logging.use_tensorboard else None,
        wandb_project=cfg.logging.wandb_project
        if cfg.logging.use_wandb else None,
        wandb_run_name=f"{cfg.experiment_id}_{cfg.run_id}",
        wandb_dir=paths.wandb_dir)

    # graceful-stop plumbing: SIGTERM/SIGINT (preemption) or a custom hook
    import signal
    stop_flag = {"stop": False}

    def _request_stop(signum, frame):  # pragma: no cover - signal timing
        logger.info("signal %d: finishing step, checkpointing, exiting",
                    signum)
        stop_flag["stop"] = True

    prev_handlers = {}
    try:
        for sig in (signal.SIGTERM, signal.SIGINT):
            prev_handlers[sig] = signal.signal(sig, _request_stop)
    except ValueError:  # not the main thread; hook-only stopping
        prev_handlers = {}

    def _stopping() -> bool:
        return stop_flag["stop"] or bool(should_stop and should_stop())

    def _every(n: int, epoch: int) -> bool:
        """Epoch-periodic trigger; n <= 0 disables the feature (vis_every=0
        must mean "never", not ZeroDivisionError mid-run)."""
        return n > 0 and (epoch + 1) % n == 0

    profile_after = 1 if cfg.logging.profile_steps > 0 else -1
    profiling = False

    all_losses = []
    last_real = None
    summary: Dict[str, float] = {}
    stopped = False
    best_val = float("inf")        # best val seen (logging / metrics curve)
    best_written = float("inf")    # val of the tagged best checkpoint
    best_val_step = -1
    ckpt_best: Optional[CheckpointManager] = None
    pending_best = None            # (val, step, epoch) of a deferred write

    def _write_best_json(step_, epoch_, val_):
        import json
        with open(os.path.join(paths.output_dir, "best_val.json"),
                  "w") as f:
            json.dump({"step": step_, "epoch": epoch_,
                       "val_loss": val_}, f)
    try:
        for epoch in range(start_epoch, t.num_epochs):
            epoch_losses = []
            tic = time.time()
            # Real data rides as RAW uint8: one small upload + one fused
            # step dispatch per batch (augment+normalize run inside the
            # step jit — make_train_step docstring). The old per-batch
            # eager prep chain capped the pipeline at 176 img/s over the
            # remote tunnel vs the step's own 463 (BASELINE.md).
            batches = (({"image": jnp.asarray(b["image"]),
                         "label": jnp.asarray(b["label"])}
                        for b in dm.iterator("train"))
                       if dm else _synthetic_batches(cfg, epoch))
            for i, batch in enumerate(batches):
                if t.steps_per_epoch and i >= t.steps_per_epoch:
                    break
                if mesh is not None:
                    batch = shard_batch(batch, mesh)
                if not conditional:
                    batch = {"image": batch["image"]}
                if epoch == start_epoch and i == profile_after:
                    jax.profiler.start_trace(
                        os.path.join(paths.output_dir, "profile"))
                    profiling = True
                state, m = step_fn(state, batch)
                # Keep the loss as a device scalar: float() here would block
                # on every step and serialize the pipeline (next batch's
                # host prep + upload can't overlap the running step, which
                # costs ~3x at 256² over the remote tunnel). One device_get
                # at epoch end syncs the whole list.
                epoch_losses.append(m["loss"])
                last_real = batch["image"]
                if profiling and i >= profile_after + cfg.logging.profile_steps:
                    jax.block_until_ready(m)
                    jax.profiler.stop_trace()
                    profiling = False
                if _stopping():
                    ckpt.save(state, force=True)
                    stopped = True
                    break
            if profiling:   # epoch shorter than the trace window
                jax.profiler.stop_trace()
                profiling = False
            if stopped:
                logger.info("stopped at step %d; checkpoint saved",
                            int(state.step))
                break
            epoch_losses = [float(x) for x in jax.device_get(epoch_losses)]
            dt = time.time() - tic
            avg = float(np.mean(epoch_losses)) if epoch_losses else float("nan")
            all_losses.extend(epoch_losses)
            imgs_per_sec = len(epoch_losses) * B / max(dt, 1e-9)

            if not epoch_losses:
                raise RuntimeError(
                    f"epoch {epoch + 1} yielded zero batches "
                    "(empty dataset or steps_per_epoch=0?)")
            if _every(t.log_every, epoch):
                logger.info("epoch %d: avg_loss=%.4f (%.1f img/s)",
                            epoch + 1, avg, imgs_per_sec)
            metrics_log.log(int(state.step),
                            {"epoch": epoch + 1, "avg_loss": avg,
                             "images_per_sec": imgs_per_sec,
                             "grad_norm": float(m["grad_norm"])})

            if eval_fn is not None and _every(t.eval_every, epoch):
                val_loss = run_validation()
                if val_loss is not None:
                    improved = val_loss < best_val
                    metrics_log.log(int(state.step),
                                    {"epoch": epoch + 1,
                                     "val_loss": val_loss,
                                     "best_val_loss": min(val_loss,
                                                          best_val)})
                    if _every(t.log_every, epoch):
                        logger.info("epoch %d: val_loss=%.4f%s", epoch + 1,
                                    val_loss, " (best)" if improved else "")
                    best_val = min(best_val, val_loss)
                    # Tag the best-val checkpoint, but never *block* on it:
                    # each write device_gets the full state (~9 s for a
                    # 37 M-param 256² state over the remote tunnel), and
                    # early training improves on almost every val pass — an
                    # unthrottled best save per improvement serialized more
                    # than half of wall-clock. If the previous best write is
                    # still in flight, skip this one; the gate is
                    # ``val_loss < best_written`` (not < best seen), so any
                    # later state better than the *tagged* one still gets
                    # written — the tag converges to the best achievable at
                    # the writer's own pace.
                    if val_loss < best_written:
                        if ckpt_best is None:
                            ckpt_best = CheckpointManager(
                                paths.checkpoint_dir + "_best",
                                max_to_keep=1)
                        if ckpt_best.saving_in_progress():
                            logger.info(
                                "epoch %d: best-val save deferred "
                                "(previous write in flight)", epoch + 1)
                            pending_best = (val_loss, int(state.step),
                                            epoch + 1)
                        else:
                            pending_best = None
                            best_written = val_loss
                            best_val_step = int(state.step)
                            _write_best_json(best_val_step, epoch + 1,
                                             best_written)
                            ckpt_best.save(state, force=True)

            if _every(t.save_every, epoch):
                ckpt.save(state)

            if _every(t.vis_every, epoch) and last_real is not None:
                if last_real.dtype == jnp.uint8:   # fused-prep batches
                    last_real = prepare_batch(last_real, None, "none",
                                              t.normalization)
                n_vis = min(8, B)

                def _to_eps(xx, tt, pred):
                    # v/x0 heads: convert to the eps the sampler consumes
                    if parameterization == "eps":
                        return pred
                    from superdiff_tpu.diffusion.process import eps_from_pred
                    return eps_from_pred(schedule, xx, tt, pred,
                                         parameterization)

                if conditional:
                    y_vis = jnp.arange(n_vis, dtype=jnp.int32) \
                        % cfg.model.num_classes
                    fn = lambda xx, tt, yy: _to_eps(xx, tt, state.apply_fn(
                        state.ema_params, xx, tt, yy))
                else:
                    y_vis = None
                    fn = lambda xx, tt: _to_eps(xx, tt, state.apply_fn(
                        state.ema_params, xx, tt))
                gen = ddpm_sample(schedule, fn, (n_vis, R, R, 1),
                                  jax.random.fold_in(root_key, 7_000 + epoch),
                                  y=y_vis)
                save_real_vs_generated(
                    np.asarray(last_real[:n_vis]), np.asarray(gen),
                    os.path.join(paths.output_dir,
                                 f"samples_epoch{epoch + 1}.png"))

        if all_losses:
            save_loss_curve(all_losses,
                            os.path.join(paths.output_dir, "loss_curve.png"))
            summary["final_loss"] = all_losses[-1]
            summary["mean_last_epoch_loss"] = (
                avg if not stopped else float(np.mean(epoch_losses)))
        ckpt.save(state, force=True)
        if (ckpt_best is not None and pending_best is not None
                and pending_best[0] < best_written
                and pending_best[1] == int(state.step)):
            # A deferred improvement at the FINAL val pass: no training
            # step has happened since, so the current state IS the
            # deferred-best state — wait out the in-flight write and tag
            # it. (Mid-run deferrals can't be recovered — those params are
            # gone — but they only stay untagged if nothing better than
            # the written tag ever follows.)
            ckpt_best.wait()
            best_written, best_val_step, pend_epoch = pending_best
            _write_best_json(best_val_step, pend_epoch, best_written)
            ckpt_best.save(state, force=True)
        if ckpt_best is not None:
            # report the TAGGED checkpoint's numbers (what best_val.json and
            # <checkpoint_dir>_best actually hold); best seen may be lower
            # if its write was deferred mid-improvement-burst
            summary["best_val_loss"] = best_written
            summary["best_val_step"] = float(best_val_step)
    finally:
        # Restore process-wide handlers and close an in-flight trace
        # even when a step raises (NaN debug, OOM, data error) —
        # otherwise the host process keeps a dead stop-flag as its
        # SIGINT/SIGTERM handler and an open profiler session.
        if profiling:
            jax.profiler.stop_trace()
            profiling = False
        for sig, h in prev_handlers.items():
            signal.signal(sig, h)
        # Always finalize writers: Orbax saves are async, and an exception
        # between save() and close() would strand *.orbax-checkpoint-tmp
        # dirs that restore() cannot read (the commit thread then dies at
        # interpreter shutdown with "cannot schedule new futures"). A close
        # failure is only swallowed (logged) when another exception is
        # already propagating; on a clean exit it must surface — a failed
        # final Orbax commit is not a successful run.
        import sys as _sys
        exc_in_flight = _sys.exc_info()[0] is not None
        close_err: Optional[BaseException] = None
        for closer in (ckpt.close,
                       ckpt_best.close if ckpt_best is not None else None,
                       metrics_log.close):
            if closer is None:
                continue
            try:
                closer()
            except Exception as e:  # pragma: no cover - teardown errors
                logger.exception("finalizing a writer failed")
                close_err = close_err or e
        if close_err is not None and not exc_in_flight:
            raise close_err
    summary["steps"] = int(state.step)
    summary["stopped_early"] = float(stopped)
    return summary
