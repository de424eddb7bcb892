"""DPM-Solver++(2M) vs DDIM on the flagship preset (one v5e chip).

The fast-sampling ladder: DDPM-1000 (quality reference), DDIM-50 (the
reference's declared-but-missing accelerated path), DPM++(2M)-20/-10 (the
round-3 rung: 2nd-order multistep, ~20 calls match DDIM-50 — order
validated analytically in tests/test_samplers.py).

    python scripts/bench_r3_dpmpp.py > /tmp/r3_dpmpp.jsonl 2>/tmp/r3_dpmpp.log
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T = 1000
BATCH = 16
RES = 256
PRESET = os.environ.get("PRESET", "attn256d")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from superdiff_tpu.models.presets import build_model
    from superdiff_tpu.utils.env import host_init
    from superdiff_tpu.inference import apply_sampling_policy
    from superdiff_tpu.diffusion import (make_schedule, ddim_sample,
                                         dpmpp_sample)

    log(f"backend: {jax.default_backend()} preset: {PRESET}")
    model = build_model(PRESET, num_classes=2, norm_dtype=jnp.bfloat16)
    shape = (BATCH, RES, RES, 1)
    x = jnp.zeros(shape, dtype=jnp.float32)
    t0 = jnp.zeros((BATCH,), dtype=jnp.int32)
    y = jnp.zeros((BATCH,), dtype=jnp.int32)
    params = host_init(model.init, jax.random.PRNGKey(0), x, t0, y)
    model, params = apply_sampling_policy(model, params)
    schedule = make_schedule(T)
    fn = lambda xx, tt, yy: model.apply(params, xx, tt, yy)

    def run(name, sampler, steps):
        jitted = jax.jit(lambda r: sampler(
            schedule, fn, shape, r, num_steps=steps, y=y,
            guidance_scale=1.0))
        rng = jax.random.PRNGKey(1)
        tic = time.time()
        jax.block_until_ready(jitted(rng))
        log(f"  [{name}] compile+first: {time.time() - tic:.0f}s")
        best = float("inf")
        for _ in range(3):
            tic = time.time()
            jax.block_until_ready(jitted(rng))
            best = min(best, time.time() - tic)
        rec = {"sampler": name, "steps": steps,
               "samples_per_sec": round(BATCH / best, 3),
               "ms_per_step": round(best / steps * 1e3, 3),
               "sec_per_batch16": round(best, 3)}
        print(json.dumps(rec), flush=True)
        log(f"[{name}] {rec}")

    run("dpmpp", dpmpp_sample, 20)
    run("dpmpp", dpmpp_sample, 10)
    run("ddim", lambda *a, **k: ddim_sample(*a, eta=0.0, **k), 50)
    run("ddim", lambda *a, **k: ddim_sample(*a, eta=0.0, **k), 20)


if __name__ == "__main__":
    main()
