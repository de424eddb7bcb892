"""Materialize a SuperDiff superposition as an on-disk dataset tree.

VERDICT r4 #6 (distill the namesake): the OR-superposed sampler is the
framework's headline capability but runs at ~0.84 samples/sec (two full
denoisers + Itô density tracking per step). Distilling it to a few-step
student needs a *stateless* teacher, and the superposed eps-mixture is
path-dependent (its kappa weights ride the integrated log-densities), so
the honest route is sample-space: draw a dataset FROM the true superposed
sampler once, then train + progressively distill a standard model on it
(``cli.train`` / ``cli.distill`` consume the tree like any disease tree).

Writes ``<root>/<task>/{train,val,test}/<task>/imgNNNNN.png`` (the exact
layout ``src/data/dataset.py:14-25`` consumes; single class dir — the
superposition is one unconditional distribution) plus ``meta.json`` with
the per-batch Itô logq-gap statistics of the generating trajectories.

Usage:
    python scripts/build_super_tree.py \
        --run-dir data/outputs/TB/experiment_q256_run_q_wide256_tb \
        --run-dir2 data/outputs/PNEUMONIA/experiment_q256_run_q_wide256_pneu \
        --root data/super_or --task SUPERPOSED \
        --train 2048 --val 128 --test 512
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--run-dir", required=True)
    p.add_argument("--run-dir2", required=True)
    p.add_argument("--root", default="data/super_or")
    p.add_argument("--task", default="SUPERPOSED")
    p.add_argument("--train", type=int, default=2048)
    p.add_argument("--val", type=int, default=128)
    p.add_argument("--test", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--mode", choices=["or", "and", "fixed"], default="or")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import numpy as np
    from PIL import Image

    from superdiff_tpu.diffusion.superdiff import superdiff_sample
    from superdiff_tpu.inference import (apply_sampling_policy,
                                         check_superpose_compat, load_run,
                                         make_eps_fn_p)

    splits = {"train": args.train, "val": args.val, "test": args.test}
    dirs = {s: os.path.join(args.root, args.task, s, args.task)
            for s in splits}
    if all(os.path.isdir(d) and len(os.listdir(d)) >= n
           for (s, n), d in zip(splits.items(), dirs.values())):
        print("tree complete, nothing to do")
        return 0

    cfg, model, schedule, ema = load_run(args.run_dir)
    cfg2, model2, schedule2, ema2 = load_run(args.run_dir2)
    check_superpose_compat(cfg, cfg2)
    model, ema = apply_sampling_policy(model, ema)
    model2, ema2 = apply_sampling_policy(model2, ema2)

    R = cfg.training.resolution
    B = args.batch_size
    shape = (B, R, R, 1)
    # sequential per-model calls inside one compiled scan (measured faster
    # than vmap-over-params on v5e — see cli/sample.py)
    apply1 = make_eps_fn_p(model, None, schedule=schedule)
    apply2 = make_eps_fn_p(model2, None, schedule=schedule)

    def _superposed(r, p1, p2):
        fns = [lambda x, t: apply1(p1, x, t),
               lambda x, t: apply2(p2, x, t)]
        return superdiff_sample(schedule, fns, shape, r, mode=args.mode,
                                num_models=2)

    jitted = jax.jit(_superposed)

    meta = {"mode": args.mode, "resolution": R, "seed": args.seed,
            "run_dir": args.run_dir, "run_dir2": args.run_dir2,
            "splits": {}, "logq_gap_mean": [], "logq_gap_std": []}
    bi = 0
    for split, count in splits.items():
        d = dirs[split]
        os.makedirs(d, exist_ok=True)
        have = len([f for f in os.listdir(d) if f.endswith(".png")])
        if have >= count:
            print(f"skip {split} ({have} present)")
            # keep the batch counter aligned so re-runs extend, not repeat
            bi += (count + B - 1) // B
            continue
        # resume a partially built split at the last whole batch: the
        # PRNG key is (seed + bi), so aligning bi to the completed batch
        # count regenerates the identical continuation (a killed client
        # — e.g. the single-tenant compile-service wedge — costs only
        # the partial batch, not the split)
        written = (have // B) * B
        bi += written // B
        tic = time.time()
        if written:
            print(f"[{split}] resuming at {written}/{count}")
        while written < count:
            xs, logq = jitted(jax.random.PRNGKey(args.seed + bi), ema, ema2)
            xs = np.asarray(xs)
            logq = np.asarray(logq)
            gap = logq[0] - logq[1]
            meta["logq_gap_mean"].append(float(gap.mean()))
            meta["logq_gap_std"].append(float(gap.std()))
            n = min(B, count - written)
            for j in range(n):
                img = xs[j, :, :, 0]
                lo, hi = img.min(), img.max()
                arr = ((img - lo) / max(hi - lo, 1e-6) * 255).astype(
                    np.uint8)
                Image.fromarray(arr, "L").save(
                    os.path.join(d, f"img{written + j:05d}.png"))
            written += n
            bi += 1
            if bi % 8 == 0:
                rate = written / max(time.time() - tic, 1e-9)
                print(f"[{split}] {written}/{count} "
                      f"({rate:.2f} samples/s)", flush=True)
        meta["splits"][split] = written
        print(f"[{split}] done: {written} images in "
              f"{time.time() - tic:.0f}s", flush=True)

    with open(os.path.join(args.root, args.task, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print("superposed tree ready:", os.path.join(args.root, args.task))
    return 0


if __name__ == "__main__":
    sys.exit(main())
