"""Evaluation CLI: FID + Itô log-density statistics for a trained run.

The north-star metrics (BASELINE.md) are FID parity on the TB/pneumonia
test sets and Itô log-density parity; the reference computes neither
(SURVEY.md §6). Generates samples from a run, computes Fréchet distance
against the test split under a chosen feature extractor, and (optionally,
with ``--run-dir2``) the SuperDiff log-densities of superposed samples
under both models.

Usage:
    python -m superdiff_tpu.cli.evaluate --run-dir RUN \
        --dataset-root /data/xray --num-samples 64
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Evaluate a trained run")
    p.add_argument("--run-dir", required=True)
    p.add_argument("--run-dir2", default=None,
                   help="second run: also evaluate superposed samples")
    p.add_argument("--dataset-root", default=None,
                   help="required for FID (test split as the real set)")
    p.add_argument("--num-samples", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--method", choices=["ddpm", "ddim", "dpmpp"],
                   default=None,
                   help="default: the run config's sampling.method when it "
                        "names a fast sampler (distilled students stamp "
                        "ddim + their step count), else the ddim-100 FID "
                        "protocol")
    p.add_argument("--num-steps", type=int, default=None)
    p.add_argument("--spacing", choices=["auto", "leading", "trailing"],
                   default="auto",
                   help="DDIM grid spacing; auto reads the run config's "
                        "sampling.t_spacing (distilled students need "
                        "trailing)")
    p.add_argument("--extractor",
                   default="diffusion",
                   help="feature space(s) for FID — one name or a comma "
                        "list (sampling runs ONCE; each extractor scores "
                        "the same generated set, amortizing the sampler "
                        "compile). 'diffusion' uses this run's own "
                        "bottleneck (not comparable across runs); "
                        "'random' is a fixed seeded projection; "
                        "'classifier' loads a TRAINED in-framework "
                        "SmallCNN (save_classifier .npz) — the learned "
                        "feature space of record; "
                        "resnet18/densenet121/hf load a local checkpoint "
                        "(--extractor-checkpoint) shared across runs")
    p.add_argument("--extractor-checkpoint", default=None,
                   help="local checkpoint path/dir for classifier/"
                        "resnet18/densenet121/hf extractors; with a comma "
                        "list, pair per-extractor as NAME=PATH (e.g. "
                        "'resnet18=a.npz,classifier=b.npz')")
    p.add_argument("--guidance", type=float, default=1.0,
                   help="classifier-free guidance scale; values != 1 "
                        "sample class-conditionally (implies "
                        "--labels balanced unless set)")
    p.add_argument("--labels", choices=["null", "balanced"], default=None,
                   help="conditioning for generated samples: 'null' = "
                        "unconditional (default), 'balanced' = cycle "
                        "through the model's classes (required for "
                        "guidance > 1 to mean anything)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None,
                   help="write metrics JSON here (default: <run>/eval.json)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from superdiff_tpu.analysis import (
        FeatureExtractor, compute_fid)
    from superdiff_tpu.diffusion import (ddpm_sample, ddim_sample,
                                         dpmpp_sample)
    from superdiff_tpu.diffusion.superdiff import superdiff_sample
    from superdiff_tpu.inference import (apply_sampling_policy,
                                         check_superpose_compat, load_run,
                                         make_eps_fn_p)

    cfg, model, schedule, ema = load_run(args.run_dir)
    R = cfg.training.resolution
    B = args.batch_size
    # Sampling runs under the production dtype policy (bf16 norms + bf16
    # weight cast — what cli/sample.py ships, so FID measures production
    # samples); the FEATURE path below stays on the original f32
    # model/params so feature spaces remain comparable across runs.
    s_model, s_ema = apply_sampling_policy(model, ema)
    # params stay jit ARGUMENTS (not closure constants) — see
    # make_eps_fn_p: remote-compile requests must not embed the weights
    labels_mode = args.labels or ("balanced" if args.guidance != 1.0
                                  else "null")
    conditional = cfg.model.conditional and labels_mode == "balanced"
    if args.guidance != 1.0 and not cfg.model.conditional:
        raise SystemExit("--guidance needs a class-conditional run")
    if args.guidance != 1.0 and labels_mode == "null":
        # silently sampling unguided while recording guidance=2.0 would
        # mislabel the metrics; CFG only exists relative to class labels
        raise SystemExit("--guidance != 1 requires --labels balanced "
                         "(CFG steers class-conditional samples)")
    results = {}

    # --- generate ---
    shape = (B, R, R, 1)
    if conditional:
        # balanced class conditioning (+ optional CFG): cycle labels so the
        # generated set covers every class evenly, matching how a user
        # samples the conditional model (guidance 1.0 = plain conditional)
        applyp = make_eps_fn_p(s_model, "per_sample", schedule=schedule)
        extra = dict(guidance_scale=args.guidance,
                     null_label=s_model.null_label)

        def _eps(p):
            return lambda x, t, y: applyp(p, x, t, y)
    else:
        applyp = make_eps_fn_p(s_model, schedule=schedule)
        extra = {}

        def _eps(p):
            return lambda x, t: applyp(p, x, t)

    # --method omitted: a run whose config stamps a fast sampler (distilled
    # students: ddim + their trained step count) is evaluated on its own
    # grid/transition; plain runs keep the ddim-100 FID protocol default
    from superdiff_tpu.inference import resolve_sampler_spec
    method, num_steps, spacing, clip_x0 = resolve_sampler_spec(
        cfg, args.method, args.num_steps, args.spacing,
        allowed=("ddim", "dpmpp"), fallback="ddim")
    if num_steps is None:
        num_steps = 100

    if method == "ddim":
        def _sample(r, p, y):
            kw = dict(extra, y=y) if conditional else extra
            return ddim_sample(schedule, _eps(p), shape, r,
                               num_steps=num_steps,
                               t_spacing=spacing, clip_x0=clip_x0, **kw)
    elif method == "dpmpp":
        def _sample(r, p, y):
            kw = dict(extra, y=y) if conditional else extra
            return dpmpp_sample(schedule, _eps(p), shape, r,
                                num_steps=num_steps, clip_x0=clip_x0, **kw)
    else:
        def _sample(r, p, y):
            kw = dict(extra, y=y) if conditional else extra
            return ddpm_sample(schedule, _eps(p), shape, r, **kw)
    sampler = jax.jit(_sample)
    gen = []
    n_batches = (args.num_samples + B - 1) // B
    for i in range(n_batches):
        y = jnp.asarray((np.arange(B) + i * B) % max(
            cfg.model.num_classes, 1), dtype=np.int32)
        x = sampler(jax.random.PRNGKey(args.seed + i), s_ema, y)
        gen.append(np.asarray(x))
    gen = np.concatenate(gen)[:args.num_samples]
    results["num_generated"] = int(len(gen))
    results["sample_mean"] = float(gen.mean())
    results["sample_std"] = float(gen.std())
    results["labels"] = labels_mode if cfg.model.conditional else "uncond"
    results["guidance"] = float(args.guidance)
    results["sampler"] = method
    if method != "ddpm":
        results["sampler_steps"] = int(num_steps)

    # --- FID vs test split ---
    if args.dataset_root:
        from superdiff_tpu.data import DataModule

        valid = ("diffusion", "random", "classifier", "resnet18",
                 "densenet121", "hf")
        names = [e.strip() for e in args.extractor.split(",") if e.strip()]
        for e in names:
            if e not in valid:
                raise SystemExit(f"unknown extractor {e!r} (have {valid})")
        ckpts = {}
        if args.extractor_checkpoint:
            if "=" in args.extractor_checkpoint:
                for pair in args.extractor_checkpoint.split(","):
                    k, _, v = pair.partition("=")
                    ckpts[k.strip()] = v.strip()
            else:
                ckpts = {e: args.extractor_checkpoint for e in names}

        dm = DataModule(cfg, args.dataset_root)
        # probe timestep must exist in the run's schedule (the default 100
        # would silently clamp to T-1 and extract noise features for T<=100)
        probe_t = min(100, cfg.training.num_timesteps - 1)

        def build_extractor(name):
            if name == "diffusion":
                return FeatureExtractor("diffusion", params=ema,
                                        model=model, schedule=schedule,
                                        timestep=probe_t)
            if name == "random":
                return FeatureExtractor("random")
            return FeatureExtractor(name, checkpoint=ckpts.get(name))

        gen_batches = [{"image": gen[i:i + B],
                        "label": np.zeros(len(gen[i:i + B]), np.int32)}
                       for i in range(0, len(gen), B)]
        results["fid_by_extractor"] = {}
        for name in names:
            ex = build_extractor(name)
            real_batches = dm.device_batches("test", jax.random.PRNGKey(1))
            fid = compute_fid(ex, real_batches, gen_batches,
                              max_samples=args.num_samples)
            results["fid_by_extractor"][name] = float(fid)
        # single-extractor back-compat fields (what every earlier artifact
        # and downstream parser reads)
        results["fid"] = results["fid_by_extractor"][names[0]]
        results["fid_extractor"] = names[0]

    # --- superposed log-densities ---
    if args.run_dir2:
        cfg2, model2, schedule2, ema2 = load_run(args.run_dir2)
        check_superpose_compat(cfg, cfg2)
        s_model2, s_ema2 = apply_sampling_policy(model2, ema2)
        # sequential per-model calls: measured faster than the stacked
        # vmap on TPU (see cli/sample.py and scripts/bench_superdiff.py).
        # Superposition always samples the null-label (unconditional)
        # densities, independent of the FID section's conditioning — the
        # conditional applyp above binds per-sample labels and must not
        # be reused here.
        apply1 = make_eps_fn_p(s_model, schedule=schedule)
        apply2 = make_eps_fn_p(s_model2, schedule=schedule)

        def _superposed(r, p1, p2):
            fns = [lambda x, t: apply1(p1, x, t),
                   lambda x, t: apply2(p2, x, t)]
            return superdiff_sample(schedule, fns, shape, r,
                                    mode="or", num_models=2)

        xs, logq = jax.jit(_superposed)(
            jax.random.PRNGKey(args.seed), s_ema, s_ema2)
        logq = np.asarray(logq)
        results["superdiff"] = {
            "logq_model1_mean": float(logq[0].mean()),
            "logq_model2_mean": float(logq[1].mean()),
            "logq_gap_mean": float((logq[0] - logq[1]).mean()),
            "logq_gap_std": float((logq[0] - logq[1]).std()),
        }

    out_path = args.out or os.path.join(args.run_dir, "eval.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
