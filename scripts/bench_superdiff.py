"""SuperDiff 2-model superposition throughput on one chip.

Round 2 settled sequential-per-model vs vmap-over-stacked-params
(sequential wins on conv UNets: 0.822 vs 0.686 samples/sec at eff256 —
batching the *weights* turns every conv into an M-kernel batched conv);
round 3 re-measures the production sequential path under the sampling
dtype policy (bf16 norm passes + bf16 weight cast) with params passed as
jit arguments, exactly like ``cli/sample.py --run-dir2``.

    python scripts/bench_superdiff.py --preset attn256d > /tmp/sd.jsonl \
        2>/tmp/sd.log
    python scripts/bench_superdiff.py --stacked   # re-run the A/B variant
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="attn256d")
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--T", type=int, default=1000)
    p.add_argument("--mode", default="or", choices=["or", "and", "fixed"])
    p.add_argument("--stacked", action="store_true",
                   help="also time the vmap-over-stacked-params variant")
    p.add_argument("--no-policy", action="store_true",
                   help="skip the bf16 sampling policy (round-2 numerics)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from superdiff_tpu.diffusion import make_schedule
    from superdiff_tpu.diffusion.superdiff import (stack_eps_fns,
                                                   superdiff_sample)
    from superdiff_tpu.inference import (apply_sampling_policy,
                                         make_eps_fn_p)
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
    if not args.no_policy:
        model, params1 = apply_sampling_policy(model, params1)
        _, params2 = apply_sampling_policy(model, params2)
    print("params initialized", file=sys.stderr, flush=True)

    schedule = make_schedule(args.T)
    applyp = make_eps_fn_p(model)        # fn(params, x, t) -> eps

    results = {}

    def time_variant(tag, fn, *fn_args):
        tic = time.time()
        fn(jax.random.PRNGKey(2), *fn_args)[0].block_until_ready()
        print(f"{tag}: compile+first {time.time()-tic:.0f}s",
              file=sys.stderr, flush=True)
        best = float("inf")
        for k in range(2):
            tic = time.time()
            out, logq = fn(jax.random.PRNGKey(3 + k), *fn_args)
            out.block_until_ready()
            best = min(best, time.time() - tic)
            assert bool(jnp.isfinite(out).all())
            assert bool(jnp.isfinite(logq).all())
        results[tag] = {"samples_per_sec": round(B / best, 3),
                        "ms_per_step": round(best / args.T * 1e3, 2)}
        print(f"{tag}: {results[tag]}", file=sys.stderr, flush=True)

    # the production path: sequential per-model closures, params as args
    def sequential(r, p1, p2):
        fns = [lambda xx, tt: applyp(p1, xx, tt),
               lambda xx, tt: applyp(p2, xx, tt)]
        return superdiff_sample(schedule, fns, shape, r, mode=args.mode,
                                num_models=2)

    time_variant("sequential", jax.jit(sequential), params1, params2)

    if args.stacked:
        stacked_fns = stack_eps_fns(lambda p, xx, tt: applyp(p, xx, tt),
                                    [params1, params2])
        time_variant("stacked", jax.jit(
            lambda r: superdiff_sample(schedule, stacked_fns, shape, r,
                                       mode=args.mode, num_models=2)))

    print(json.dumps({"preset": args.preset, "batch": B, "mode": args.mode,
                      "policy": not args.no_policy, **results}))


if __name__ == "__main__":
    main()
