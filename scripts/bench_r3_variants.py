"""Round-3 sampling dtype-policy A/B on the real TPU chip.

Measures full DDPM-1000 ancestral sampling (one ``lax.scan``) for the
flagship presets under four dtype configurations:

  base        f32 params enter the scan, f32 norm passes   (round-2 ship)
  bf16p       params cast to bf16 once outside the scan
  bf16n       bf16 norm passes (flax still reduces stats in f32)
  bf16pn      both

Rationale (VERDICT round 2, weak #1): eff256 stalled at 42.7% MFU; the f32
norm passes and the per-step f32 weight reads are the two HBM taxes this
removes. Emits one JSON line per measurement; run with stdout to a file:

    python scripts/bench_r3_variants.py > /tmp/r3_variants.jsonl 2>/tmp/r3_variants.log
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T = 1000


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure(preset, batch, bf16_params, bf16_norms, params_cache={}):
    import jax
    import jax.numpy as jnp
    from superdiff_tpu.diffusion import make_schedule, ddpm_sample
    from superdiff_tpu.models.presets import build_model
    from superdiff_tpu.inference import cast_sampling_params
    from superdiff_tpu.utils.env import host_init

    model = build_model(
        preset, num_classes=2,
        norm_dtype=jnp.bfloat16 if bf16_norms else jnp.float32)
    R = 256
    shape = (batch, R, R, 1)
    y = jnp.zeros((batch,), dtype=jnp.int32)

    if preset not in params_cache:
        x = jnp.zeros(shape, dtype=jnp.float32)
        t0 = jnp.zeros((batch,), dtype=jnp.int32)
        tic = time.time()
        params_cache[preset] = host_init(
            model.init, jax.random.PRNGKey(0), x, t0, y)
        log(f"[{preset}] init in {time.time()-tic:.0f}s")
    params = params_cache[preset]
    if bf16_params:
        params = cast_sampling_params(params)

    schedule = make_schedule(T)
    fn = lambda xx, tt, yy: model.apply(params, xx, tt, yy)
    sample = jax.jit(lambda r: ddpm_sample(
        schedule, fn, shape, r, y=y, guidance_scale=1.0))

    tag = (f"{preset} B={batch} "
           f"{'bf16p' if bf16_params else 'f32p'}+"
           f"{'bf16n' if bf16_norms else 'f32n'}")
    tic = time.time()
    sample(jax.random.PRNGKey(1)).block_until_ready()
    log(f"[{tag}] compile+first: {time.time()-tic:.0f}s")

    best = float("inf")
    for i in range(2):
        tic = time.time()
        out = sample(jax.random.PRNGKey(2 + i))
        out.block_until_ready()
        best = min(best, time.time() - tic)
    assert bool(jnp.isfinite(out).all())
    rec = {"preset": preset, "batch": batch,
           "bf16_params": bf16_params, "bf16_norms": bf16_norms,
           "samples_per_sec": round(batch / best, 4),
           "ms_per_step": round(best / T * 1e3, 3)}
    print(json.dumps(rec), flush=True)
    log(f"[{tag}] {rec['samples_per_sec']} samples/sec "
        f"({rec['ms_per_step']} ms/step)")
    return rec


def main():
    import jax
    log(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    # eff256: the full 2x2 grid at the flagship batch
    results = {}
    for bp, bn in ((False, False), (True, False), (False, True),
                   (True, True)):
        r = measure("eff256", 16, bp, bn)
        results[(bp, bn)] = r["samples_per_sec"]

    # best variant: batch sweep (does the HBM relief move the sweet spot?)
    best = max(results, key=results.get)
    for batch in (24, 32):
        measure("eff256", batch, *best)

    # attn256: base vs both (the quality preset's win matters for the
    # flagship-unification decision)
    measure("attn256", 16, False, False)
    measure("attn256", 16, *best)


if __name__ == "__main__":
    main()
