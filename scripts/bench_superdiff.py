"""Measure 256² SuperDiff-1000 superposed sampling throughput on the real
chip: sequential per-model calls vs the stacked vmap call
(``diffusion/superdiff.py::stack_eps_fns``). Round-1 measured 0.82
samples/sec with sequential calls (BASELINE.md); the stacked call batches
both denoisers into one vmapped forward per scan step.

Usage: python scripts/bench_superdiff.py [--preset eff256] [--batch 16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="eff256")
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--T", type=int, default=1000)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from superdiff_tpu.diffusion import make_schedule
    from superdiff_tpu.diffusion.superdiff import (stack_eps_fns,
                                                   superdiff_sample)
    from superdiff_tpu.models.presets import build_model
    from superdiff_tpu.utils.env import host_init

    model = build_model(args.preset, num_classes=2)
    B, R = args.batch, args.res
    shape = (B, R, R, 1)
    x = jnp.zeros(shape)
    t0 = jnp.zeros((B,), jnp.int32)
    y = jnp.zeros((B,), jnp.int32)
    params1 = host_init(model.init, jax.random.PRNGKey(0), x, t0, y)
    params2 = host_init(model.init, jax.random.PRNGKey(1), x, t0, y)
    print("params initialized", file=sys.stderr, flush=True)

    schedule = make_schedule(args.T)
    apply = lambda p, xx, tt: model.apply(p, xx, tt, y)

    variants = {
        "sequential": [lambda xx, tt: apply(params1, xx, tt),
                       lambda xx, tt: apply(params2, xx, tt)],
        "stacked": stack_eps_fns(apply, [params1, params2]),
    }
    results = {}
    for tag, fns in variants.items():
        fn = jax.jit(lambda r, f=fns: superdiff_sample(
            schedule, f, shape, r, mode="or", num_models=2))
        tic = time.time()
        fn(jax.random.PRNGKey(2))[0].block_until_ready()
        print(f"{tag}: compile+run {time.time()-tic:.0f}s",
              file=sys.stderr, flush=True)
        tic = time.time()
        out, logq = fn(jax.random.PRNGKey(3))
        out.block_until_ready()
        dt = time.time() - tic
        assert bool(jnp.isfinite(out).all()) and bool(jnp.isfinite(logq).all())
        results[tag] = {"samples_per_sec": round(B / dt, 3),
                        "ms_per_step": round(dt / args.T * 1e3, 2)}
        print(f"{tag}: {results[tag]}", file=sys.stderr, flush=True)
    print(json.dumps({"preset": args.preset, "batch": B, **results}))


if __name__ == "__main__":
    main()
