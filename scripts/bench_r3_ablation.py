"""Round-3 ablation: where do eff256's non-roofline milliseconds live?

With bf16 norms the sampler runs 8.67 ms/step vs a 4.2 ms bf16-MXU bound
(0.823 TFLOP / 197 TFLOP/s). This script measures marginal costs on the
real chip to locate the rest:

  denoiser  model forward only in a scan (no sampler math / RNG) -> the
            sampler-side overhead is (full - denoiser)
  rbg       full sampler under the rbg PRNG (threefry per-step normal
            draws are VPU-heavy at 1M elements/step)
  noattn    attn_resolutions=() -> marginal cost of 16^2 attention
  nrb1      num_res_blocks=1 -> does time scale with FLOPs? (compute-bound
            check: nrb1 has ~55%% of the FLOPs)
  unroll2   lax.scan unroll=2

    python scripts/bench_r3_ablation.py > /tmp/r3_ablation.jsonl 2>/tmp/r3_ablation.log
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T = 1000
BATCH = 16
RES = 256


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(name, dt, batch=BATCH, steps=T):
    rec = {"variant": name,
           "samples_per_sec": round(batch / dt, 4),
           "ms_per_step": round(dt / steps * 1e3, 3)}
    print(json.dumps(rec), flush=True)
    log(f"[{name}] {rec['samples_per_sec']} samples/sec "
        f"({rec['ms_per_step']} ms/step)")


def build(preset="eff256", **overrides):
    import jax
    import jax.numpy as jnp
    from superdiff_tpu.models.presets import build_model
    from superdiff_tpu.utils.env import host_init

    model = build_model(preset, num_classes=2,
                        norm_dtype=jnp.bfloat16, **overrides)
    shape = (BATCH, RES, RES, 1)
    x = jnp.zeros(shape, dtype=jnp.float32)
    t0 = jnp.zeros((BATCH,), dtype=jnp.int32)
    y = jnp.zeros((BATCH,), dtype=jnp.int32)
    params = host_init(model.init, jax.random.PRNGKey(0), x, t0, y)
    return model, params, shape, y


def time_it(fn, arg):
    import jax
    tic = time.time()
    jax.block_until_ready(fn(arg))
    log(f"  compile+first: {time.time()-tic:.0f}s")
    best = float("inf")
    for i in range(2):
        tic = time.time()
        jax.block_until_ready(fn(arg))
        best = min(best, time.time() - tic)
    return best


def full_sampler(model, params, shape, y):
    import jax
    from superdiff_tpu.diffusion import make_schedule, ddpm_sample

    schedule = make_schedule(T)
    fn = lambda xx, tt, yy: model.apply(params, xx, tt, yy)
    return jax.jit(lambda r: ddpm_sample(
        schedule, fn, shape, r, y=y, guidance_scale=1.0))


def main():
    import jax
    import jax.numpy as jnp

    log(f"backend: {jax.default_backend()}")

    model, params, shape, y = build()

    # 1. full sampler (bf16n reference point)
    emit("full", time_it(full_sampler(model, params, shape, y),
                         jax.random.PRNGKey(1)))

    # 2. denoiser-only scan: x_{k+1} = apply(x_k) — no RNG, no sampler math
    def denoiser_only(x0):
        def step(x, t_scalar):
            t = jnp.full((BATCH,), t_scalar, dtype=jnp.int32)
            return model.apply(params, x, t, y).astype(x.dtype), None
        xf, _ = jax.lax.scan(step, x0,
                             jnp.arange(T, dtype=jnp.int32))
        return xf
    x0 = jax.random.normal(jax.random.PRNGKey(0), shape)
    emit("denoiser_only", time_it(jax.jit(denoiser_only), x0))

    # 3. rbg PRNG for the in-scan normal draws
    with jax.default_prng_impl("rbg"):
        emit("rbg_prng", time_it(full_sampler(model, params, shape, y),
                                 jax.random.PRNGKey(1)))

    # 4. unroll=2 via monkeypatched scan — measure via denoiser-only x2
    def denoiser_unroll(x0):
        def step(x, t_scalar):
            t = jnp.full((BATCH,), t_scalar, dtype=jnp.int32)
            return model.apply(params, x, t, y).astype(x.dtype), None
        xf, _ = jax.lax.scan(step, x0, jnp.arange(T, dtype=jnp.int32),
                             unroll=2)
        return xf
    emit("denoiser_unroll2", time_it(jax.jit(denoiser_unroll), x0))

    # 5. no attention (marginal cost of the 16^2 level)
    m2, p2, shape, y = build(attn_resolutions=())
    emit("noattn", time_it(full_sampler(m2, p2, shape, y),
                           jax.random.PRNGKey(1)))

    # 6. num_res_blocks=1 (FLOP-scaling check)
    m3, p3, shape, y = build(num_res_blocks=1)
    emit("nrb1", time_it(full_sampler(m3, p3, shape, y),
                         jax.random.PRNGKey(1)))


if __name__ == "__main__":
    main()
