"""Standalone sampling CLI — fills the reference's empty ``src/sampling.py``.

Three modes:
- single-run DDPM (1000-step ancestral), DDIM (``--num-steps``/``--eta``),
  or DPM-Solver++(2M) (``--method dpmpp``, ~20 steps match DDIM-50)
- SuperDiff superposition of two trained runs (``--run-dir2``, ``--mode``)

Each batch is one compiled ``lax.scan``; batches stream PNG grids + an .npy
stack into ``--out``. Covers the north-star configs: DDPM-1000 at 64²,
DDIM 50/100 at 128², superposed sampling at 256².

Usage:
    python -m superdiff_tpu.cli.sample --run-dir outputs/PNEUMONIA/exp_r \
        --method ddim --num-steps 50 --batch-size 8 --num-batches 2
    python -m superdiff_tpu.cli.sample --run-dir TB_RUN --run-dir2 PNEU_RUN \
        --mode or --out superposed/
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Sample from trained runs")
    p.add_argument("--run-dir", required=True,
                   help="training run dir (config.yaml + checkpoints/)")
    p.add_argument("--run-dir2", default=None,
                   help="second run dir -> SuperDiff superposition")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    p.add_argument("--best", action="store_true",
                   help="load the best-validation checkpoint "
                        "(<checkpoint_dir>_best) instead of the latest")
    p.add_argument("--method", choices=["ddpm", "ddim", "dpmpp"],
                   default=None,
                   help="default: the run config's sampling.method "
                        "(distilled students stamp ddim; plain runs ddpm)")
    p.add_argument("--num-steps", type=int, default=None,
                   help="solver steps: default the run config's "
                        "sampling.num_steps when --method is omitted, else "
                        "DDIM 50 / dpmpp 20 (ignored by ddpm, which always "
                        "runs the full T)")
    p.add_argument("--spacing", choices=["auto", "leading", "trailing"],
                   default="auto",
                   help="DDIM grid spacing; auto reads the run config's "
                        "sampling.t_spacing (distilled students need "
                        "trailing)")
    p.add_argument("--eta", type=float, default=0.0,
                   help="DDIM stochasticity (0 = deterministic); "
                        "rejected with --method dpmpp (pure ODE solver)")
    p.add_argument("--label", type=int, default=None,
                   help="class label (default: unconditional/null)")
    p.add_argument("--guidance", type=float, default=1.0)
    p.add_argument("--mode", choices=["or", "and", "fixed"], default="or")
    p.add_argument("--kappa", type=float, nargs=2, default=(0.5, 0.5))
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--num-batches", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="samples")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard each batch over all devices (data axis)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from superdiff_tpu.diffusion import (ddpm_sample, ddim_sample,
                                         dpmpp_sample)
    from superdiff_tpu.diffusion.superdiff import superdiff_sample
    from superdiff_tpu.inference import (apply_sampling_policy,
                                         check_superpose_compat, load_run,
                                         make_eps_fn_p)
    from superdiff_tpu.utils.visualization import save_image_grid

    mesh = None
    if args.data_parallel:
        from superdiff_tpu.parallel import (make_mesh,
                                            maybe_init_distributed)
        # multi-host init MUST precede any JAX computation (incl. the
        # checkpoint restore below)
        maybe_init_distributed()
        mesh = make_mesh()

    cfg, model, schedule, ema = load_run(args.run_dir, step=args.step,
                                         best=args.best)
    # production dtype policy: bf16 norm passes + one-time bf16 weight cast
    # (+13% eff256 DDPM-1000 on v5e, BASELINE.md round-3 table; opt out
    # with SUPERDIFF_TPU_SAMPLE_F32=1)
    model, ema = apply_sampling_policy(model, ema)
    R = cfg.training.resolution
    B = args.batch_size
    shape = (B, R, R, 1)
    os.makedirs(args.out, exist_ok=True)

    if mesh is not None:
        n = mesh.devices.size
        if B % n:
            raise ValueError(f"--batch-size {B} not divisible by "
                             f"{n} devices")

    def compile_sampler(fn, with_logq=False):
        if mesh is None:
            return jax.jit(fn)
        from superdiff_tpu.parallel import shard_sample
        return shard_sample(fn, mesh, with_logq=with_logq)

    def replicate(params):
        """Params enter the sharded jit as arguments; a checkpoint restore
        commits them to one device, which conflicts with the multi-device
        out_shardings — replicate across the mesh explicitly."""
        if mesh is None:
            return params
        from jax.sharding import NamedSharding, PartitionSpec
        return jax.device_put(params, NamedSharding(mesh, PartitionSpec()))

    # Params are passed as jit ARGUMENTS throughout (make_eps_fn_p):
    # closing over the weights embeds them in the lowered module, and on
    # the remote-compile backend a two-model 256² pair (~300 MB of
    # constants) exceeds the compile-request limit (HTTP 413).
    superpose = args.run_dir2 is not None
    if superpose:
        cfg2, model2, schedule2, ema2 = load_run(args.run_dir2)
        check_superpose_compat(cfg, cfg2)
        model2, ema2 = apply_sampling_policy(model2, ema2)
        # Per-model sequential calls inside the one compiled scan: measured
        # FASTER on v5e than vmapping over stacked param pytrees (0.822 vs
        # 0.686 samples/sec at eff256/batch 16, scripts/bench_superdiff.py)
        # — batching the *weights* turns every conv into an M-kernel
        # batched conv, which XLA lowers worse than two plain convs.
        # stack_eps_fns remains available for architectures where it wins.
        apply1 = make_eps_fn_p(model, args.label, schedule=schedule)
        apply2 = make_eps_fn_p(model2, args.label, schedule=schedule)

        def _superposed(r, p1, p2):
            fns = [lambda x, t: apply1(p1, x, t),
                   lambda x, t: apply2(p2, x, t)]
            return superdiff_sample(
                schedule, fns, shape, r, mode=args.mode,
                kappa=list(args.kappa), temperature=args.temperature,
                num_models=2)

        jitted = compile_sampler(_superposed, with_logq=True)
        ema, ema2 = replicate(ema), replicate(ema2)
        sample_fn = lambda r: jitted(r, ema, ema2)
    else:
        # --method omitted: follow the run config (cli/distill.py stamps
        # method/num_steps/t_spacing/clip_x0 into each student so default
        # invocations execute the exact transition the student trained on)
        from superdiff_tpu.inference import resolve_sampler_spec
        method, num_steps, spacing, clip_x0 = resolve_sampler_spec(
            cfg, args.method, args.num_steps, args.spacing)
        if cfg.model.conditional and args.label is not None:
            y = jnp.full((B,), args.label, dtype=jnp.int32)
            applyp = make_eps_fn_p(model, "per_sample", schedule=schedule)
            extra = dict(y=y, guidance_scale=args.guidance,
                         null_label=model.null_label)
        else:
            applyp = make_eps_fn_p(model, args.label, schedule=schedule)
            extra = {}

        if method == "ddim":
            steps = num_steps or 50

            def _single(r, p):
                fn = lambda *a: applyp(p, *a)
                return ddim_sample(schedule, fn, shape, r,
                                   num_steps=steps, eta=args.eta,
                                   t_spacing=spacing, clip_x0=clip_x0,
                                   **extra)
        elif method == "dpmpp":
            if args.eta:
                raise SystemExit(
                    "--eta only applies to --method ddim; DPM-Solver++ is "
                    "a deterministic ODE solver (no stochasticity knob)")
            steps = num_steps or 20

            def _single(r, p):
                fn = lambda *a: applyp(p, *a)
                return dpmpp_sample(schedule, fn, shape, r,
                                    num_steps=steps, clip_x0=clip_x0,
                                    **extra)
        else:
            def _single(r, p):
                fn = lambda *a: applyp(p, *a)
                return ddpm_sample(schedule, fn, shape, r, **extra)

        jitted = compile_sampler(_single)
        ema = replicate(ema)
        sample_fn = lambda r: jitted(r, ema)

    all_batches = []
    all_logq = []
    for b in range(args.num_batches):
        rng = jax.random.PRNGKey(args.seed + b)
        tic = time.time()
        out = sample_fn(rng)
        if superpose:
            x, logq = out
            x.block_until_ready()
            all_logq.append(np.asarray(logq))
            print(f"batch {b}: {time.time()-tic:.1f}s  "
                  f"logq1-logq2 mean "
                  f"{float(jnp.mean(logq[0]-logq[1])):.2f}")
        else:
            x = out
            x.block_until_ready()
            print(f"batch {b}: {time.time()-tic:.1f}s")
        imgs = np.asarray(x)
        all_batches.append(imgs)
        save_image_grid(imgs, os.path.join(args.out, f"batch{b}.png"))

    stack = np.concatenate(all_batches)
    np.save(os.path.join(args.out, "samples.npy"), stack)
    if all_logq:
        # per-sample Itô log-densities (2, N) + summary — the artifact the
        # quality ledger cites (BASELINE.md superdiff-256 rows); previously
        # these were print-only and unrecoverable after the run
        lq = np.concatenate(all_logq, axis=1)
        gap = lq[0] - lq[1]
        with open(os.path.join(args.out, "logq.json"), "w") as f:
            json.dump({"mode": args.mode,
                       "logq_model1": lq[0].tolist(),
                       "logq_model2": lq[1].tolist(),
                       "logq_gap_mean": float(gap.mean()),
                       "logq_gap_std": float(gap.std())}, f)
    print(f"wrote {stack.shape[0]} samples to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
