"""Experiment-scoped visualization CLI — capability of
``src/visualization/run_visualizations.py`` (+ the SLURM viz job).

Operates on a *trained run directory*: samples from the checkpoint, renders
real-vs-generated panels, reverse-trajectory strips, projections of real vs
generated features, and (with ``--run-dir2``) the cross-model comparison
panel that fills the reference's empty ``compare.py``.

Usage:
    python -m superdiff_tpu.cli.visualize --run-dir outputs/.../exp_r \
        --dataset-root data/xray --tsne --trajectory
    python -m superdiff_tpu.cli.visualize --run-dir A --run-dir2 B --compare
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Visualize a trained run")
    p.add_argument("--run-dir", required=True)
    p.add_argument("--run-dir2", default=None)
    p.add_argument("--dataset-root", default=None)
    p.add_argument("--out", default=None,
                   help="default: <run-dir>/viz")
    p.add_argument("--num-samples", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--real-vs-generated", action="store_true")
    p.add_argument("--trajectory", action="store_true")
    p.add_argument("--forward-strip", action="store_true")
    p.add_argument("--tsne", action="store_true",
                   help="project real vs generated features")
    p.add_argument("--compare", action="store_true",
                   help="A vs B vs superposed panel (needs --run-dir2)")
    p.add_argument("--dashboard", action="store_true",
                   help="write a self-contained dashboard.html "
                        "(needs --dataset-root)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from superdiff_tpu.diffusion import ddpm_sample
    from superdiff_tpu.inference import (apply_sampling_policy, load_run,
                                         make_eps_fn)
    from superdiff_tpu.utils.visualization import (
        save_real_vs_generated, save_reverse_trajectory_strip,
        save_forward_diffusion_strip, save_image_grid)

    out = args.out or os.path.join(args.run_dir, "viz")
    os.makedirs(out, exist_ok=True)
    cfg, model, schedule, ema = load_run(args.run_dir)
    R = cfg.training.resolution
    # sampling under the production dtype policy; the feature-extraction
    # path below keeps the original f32 model/params (comparable features)
    s_model, s_ema = apply_sampling_policy(model, ema)
    fn = make_eps_fn(s_model, s_ema, schedule=schedule)
    rng = jax.random.PRNGKey(args.seed)
    shape = (args.num_samples, R, R, 1)

    gen, frames = ddpm_sample(schedule, fn, shape, rng, num_frames=8)
    gen_np = np.asarray(gen)
    save_image_grid(gen_np, os.path.join(out, "generated.png"))
    print("wrote generated.png")

    if args.trajectory:
        save_reverse_trajectory_strip(np.asarray(frames),
                                      os.path.join(out, "trajectory.png"))
        print("wrote trajectory.png")

    real = None
    if args.dataset_root:
        from superdiff_tpu.data import DataModule

        dm = DataModule(cfg, args.dataset_root)
        batch = next(iter(dm.device_batches("test",
                                            jax.random.PRNGKey(1))))
        real = np.asarray(batch["image"])[:args.num_samples]

    if args.real_vs_generated:
        if real is None:
            print("--real-vs-generated needs --dataset-root", file=sys.stderr)
            return 2
        save_real_vs_generated(real, gen_np,
                               os.path.join(out, "real_vs_generated.png"))
        print("wrote real_vs_generated.png")

    if args.forward_strip:
        src = real if real is not None else gen_np
        save_forward_diffusion_strip(
            schedule, jnp.asarray(src),
            [0, schedule.num_timesteps // 4, schedule.num_timesteps // 2,
             3 * schedule.num_timesteps // 4, schedule.num_timesteps - 1],
            jax.random.PRNGKey(2), os.path.join(out, "forward_strip.png"))
        print("wrote forward_strip.png")

    if args.tsne:
        from superdiff_tpu.analysis import (
            FeatureExtractor, run_projection)

        ex = FeatureExtractor(
            "diffusion", params=ema, model=model, schedule=schedule)
        feats_gen = ex.extract(jnp.asarray(gen_np))
        if real is not None:
            feats_real = ex.extract(jnp.asarray(real))
            feats = np.concatenate([feats_real, feats_gen])
            labels = np.concatenate([np.zeros(len(feats_real), np.int32),
                                     np.ones(len(feats_gen), np.int32)])
            names = ["real", "generated"]
        else:
            feats, labels, names = feats_gen, np.zeros(
                len(feats_gen), np.int32), ["generated"]
        run_projection(feats, labels, "tsne",
                       os.path.join(out, "tsne_real_vs_gen.png"),
                       class_names=names)
        print("wrote tsne_real_vs_gen.png")

    if args.dashboard:
        if not args.dataset_root:
            print("--dashboard needs --dataset-root", file=sys.stderr)
            return 2
        from superdiff_tpu.analysis.dashboard import build_static_dashboard

        build_static_dashboard(
            args.dataset_root, os.path.join(out, "dashboard.html"),
            run_dir=args.run_dir, task=cfg.task,
            histogram_equalization=cfg.training.histogram_equalization)
        print("wrote dashboard.html")

    if args.compare:
        if not args.run_dir2:
            print("--compare needs --run-dir2", file=sys.stderr)
            return 2
        from superdiff_tpu.analysis.compare import compare_runs

        stats = compare_runs(args.run_dir, args.run_dir2, out,
                             num_samples=min(args.num_samples, 4),
                             seed=args.seed)
        print(f"wrote comparison.png; mean logq gap "
              f"{stats['mean_logq_gap']:.2f}")

    return 0


if __name__ == "__main__":
    sys.exit(main())
