"""Progressive-distillation CLI: halve sampler steps phase by phase.

Drives ``diffusion/distill.py`` (arXiv:2202.00512) over a trained run:
phase k trains an N_k-step student whose single DDIM step matches two
steps of its teacher on the 2·N_k trailing grid; the first teacher is the
run's own checkpoint (evaluable at any t), every later teacher is the
previous student (evaluable exactly at its grid — which IS the next
phase's teacher grid, since trailing grids nest node-exactly when
halving). The reference has no fast sampling at all (fixed 1000-step
Python loop, ``src/models/ddpm.py:31-45``); this produces 1-8 call
samplers from any trained run.

Each phase writes an exported inference artifact
(``config.yaml + ema_params.npz``, the ``cli/export.py`` format) into
``<run-dir>/distill/s<N>/`` with ``sampling.method=ddim``,
``sampling.num_steps=N``, ``sampling.t_spacing=trailing`` and
``sampling.clip_x0=false`` (students train on unclipped one-step
inversions) stamped in,
so ``load_run`` / sample / evaluate / serve consume a student like any
other run:

    python -m superdiff_tpu.cli.distill --run-dir RUN \
        --dataset-root data/chest_xray --steps 8,4,2,1 --phase-epochs 60
    python -m superdiff_tpu.cli.sample --run-dir RUN/distill/s4 \
        --method ddim --num-steps 4     # --spacing auto reads trailing
"""

from __future__ import annotations

import argparse
import copy
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Progressively distill a trained run to few-step "
                    "sampling")
    p.add_argument("--run-dir", required=True,
                   help="teacher training run dir (or exported artifact)")
    p.add_argument("--dataset-root", default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="distill on synthetic batches (smoke runs)")
    p.add_argument("--steps", default="8,4,2,1",
                   help="comma list of student step counts; each entry "
                        "must be half its predecessor (the student grid "
                        "must nest in its teacher's)")
    p.add_argument("--phase-epochs", type=int, default=60,
                   help="training epochs per phase")
    p.add_argument("--batch-size", type=int, default=None,
                   help="default: the run's training batch size")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup-steps", type=int, default=50)
    p.add_argument("--parameterization", choices=["eps", "v", "x0"],
                   default="v",
                   help="student head (v recommended: eps heads carry no "
                        "x0 signal at the pure-noise node 1-2 step "
                        "samplers start from, arXiv:2202.00512 §2.4)")
    p.add_argument("--null-prob", type=float, default=0.5,
                   help="probability of distilling the null-label "
                        "(unconditional) path per example on conditional "
                        "runs — keep > 0 if you sample/evaluate "
                        "unconditionally")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None,
                   help="output base (default: <run-dir>/distill)")
    return p


def _parse_steps(spec: str):
    steps = [int(s) for s in spec.split(",") if s.strip()]
    if not steps or any(s < 1 for s in steps):
        raise SystemExit(f"bad --steps {spec!r}")
    for a, b in zip(steps, steps[1:]):
        if b * 2 != a:
            raise SystemExit(
                f"--steps must halve phase over phase (got {a} -> {b}): "
                "a student is only trained at its own grid nodes, so the "
                "next phase's teacher grid (2x its step count) must "
                "coincide with them")
    return steps


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    steps_list = _parse_steps(args.steps)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from superdiff_tpu.config import save_config
    from superdiff_tpu.cli.export import export_params
    from superdiff_tpu.data.datamodule import DataModule
    from superdiff_tpu.diffusion.distill import make_distill_step
    from superdiff_tpu.inference import load_run, make_eps_fn_p
    from superdiff_tpu.models.presets import model_from_config
    from superdiff_tpu.training.loop import _synthetic_batches
    from superdiff_tpu.training.state import (create_train_state,
                                              make_optimizer)
    import logging

    from superdiff_tpu.utils.logger import init_logger

    init_logger(stdout=True)
    logger = logging.getLogger("superdiff_tpu")
    cfg, teacher_model, schedule, teacher_params = load_run(args.run_dir)
    t = cfg.training
    B = args.batch_size or t.batch_size
    conditional = cfg.model.conditional
    out_base = args.out or os.path.join(args.run_dir, "distill")

    # student config: same architecture, student head parameterization
    s_cfg = copy.deepcopy(cfg)
    s_cfg.model.parameterization = args.parameterization
    s_cfg.training.batch_size = B
    student_model = model_from_config(s_cfg)

    # data
    dm = None
    if not args.synthetic:
        root = args.dataset_root
        if root is None:
            raise SystemExit("--dataset-root required (or --synthetic)")
        dm = DataModule(s_cfg, root)
        dm.index("train")

    def batches(epoch):
        if dm is not None:
            return ({"image": jnp.asarray(b["image"]),
                     "label": jnp.asarray(b["label"])}
                    for b in dm.iterator("train", epoch=epoch))
        return _synthetic_batches(s_cfg, epoch, augmentation="none")

    steps_per_epoch = (len(dm.iterator("train", epoch=0)) if dm
                       else (t.steps_per_epoch or 4))

    # The FIRST teacher may be any parameterization — its eps adapter
    # handles the conversion. Later teachers are the students themselves.
    teacher_fn = make_eps_fn_p(teacher_model,
                               "per_sample" if conditional else None,
                               schedule=schedule)
    # Phase 1 rolls the teacher with its own sampler's clip policy (so the
    # distillation target IS the trajectory its baseline FID rows sample);
    # student-teachers trained on unclipped inversions roll unclipped.
    teacher_clip = bool(getattr(cfg.sampling, "clip_x0", True))

    rng = jax.random.PRNGKey(args.seed)
    for phase_idx, N in enumerate(steps_list):
        phase_tic = time.time()
        total_steps = steps_per_epoch * args.phase_epochs
        # short smoke phases: keep warmup strictly inside the phase so the
        # cosine decay always has positive length
        warmup = min(args.warmup_steps, total_steps // 2)
        tx = make_optimizer(learning_rate=args.lr,
                            warmup_steps=warmup,
                            total_steps=total_steps, schedule="cosine")
        x0 = jnp.zeros((B, t.resolution, t.resolution, 1))
        t0 = jnp.zeros((B,), dtype=jnp.int32)
        sample_args = ((x0, t0, jnp.zeros((B,), dtype=jnp.int32))
                       if conditional else (x0, t0))
        rng, init_rng = jax.random.split(rng)
        state = create_train_state(student_model, init_rng, sample_args,
                                   tx=tx, ema_decay=t.ema_decay)
        # Warm-start from the teacher: same graph, so the pytrees match
        # (for the first phase with a non-eps student the head is
        # re-interpreted; the first distill epochs re-train it in place).
        # The copies are REQUIRED, not defensive: the student state is
        # donated by the jitted step while teacher_params rides alongside
        # as a non-donated argument — aliased buffers trip XLA's
        # "donate the same buffer twice" (and params/ema aliasing would
        # too).
        fresh = lambda tr: jax.tree_util.tree_map(jnp.array, tr)
        state = state.replace(params=fresh(teacher_params),
                              ema_params=fresh(teacher_params))

        step_fn = make_distill_step(
            schedule, teacher_fn, num_student_steps=N,
            conditional=conditional,
            parameterization=args.parameterization,
            null_prob=args.null_prob if conditional else 0.0,
            null_label=getattr(student_model, "null_label", 0),
            normalization=t.normalization,
            clip_x0=teacher_clip)

        for epoch in range(args.phase_epochs):
            losses = []
            tic = time.time()
            for batch in batches(epoch):
                if not conditional:
                    batch = {"image": batch["image"]}
                state, m = step_fn(state, teacher_params, batch)
                losses.append(m["loss"])
            losses = [float(x) for x in jax.device_get(losses)]
            if (epoch + 1) % 10 == 0 or epoch == args.phase_epochs - 1:
                logger.info(
                    "phase %d (N=%d) epoch %d/%d: loss=%.5f (%.1f img/s)",
                    phase_idx + 1, N, epoch + 1, args.phase_epochs,
                    float(np.mean(losses)),
                    len(losses) * B / max(time.time() - tic, 1e-9))

        # export the student as an inference artifact load_run understands
        sdir = os.path.join(out_base, f"s{N}")
        os.makedirs(sdir, exist_ok=True)
        out_cfg = copy.deepcopy(s_cfg)
        out_cfg.sampling.method = "ddim"
        out_cfg.sampling.num_steps = N
        out_cfg.sampling.t_spacing = "trailing"
        out_cfg.sampling.eta = 0.0
        # distill_targets inverts the UNclipped one-step transition — the
        # x0 the student learned to predict routinely lies outside [-1, 1]
        # at high-noise nodes (it encodes the direction term needed to land
        # on the teacher trajectory). Clamping it at inference would
        # execute a different map than the one trained; sample/evaluate/
        # serve honor this stamp via inference.resolve_sampler_spec.
        out_cfg.sampling.clip_x0 = False
        save_config(out_cfg, os.path.join(sdir, "config.yaml"))
        ema_host = jax.device_get(state.ema_params)
        export_params(ema_host, os.path.join(sdir, "ema_params.npz"))
        logger.info("phase %d done in %.0fs -> %s (sample with: --method "
                    "ddim --num-steps %d, spacing auto->trailing)",
                    phase_idx + 1, time.time() - phase_tic, sdir, N)

        # the student becomes the next phase's teacher; students are
        # already eps-adaptable through their own parameterization and
        # execute the unclipped transition they trained on
        teacher_params = state.ema_params
        teacher_fn = make_eps_fn_p(student_model,
                                   "per_sample" if conditional else None,
                                   schedule=schedule)
        teacher_clip = False

    print(f"distilled {args.run_dir} -> {out_base} "
          f"(students: {steps_list})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
