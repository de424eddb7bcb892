"""Round-3 slim-top-level A/B on the real TPU chip.

The xplane profile (BASELINE.md "where the time actually goes") shows 52%
of the flagship attn256d step is GroupNorm-chain HBM traffic and 62% of
device time executes at >=128² shapes, where C=64 half-fills the (8, 128)
lane tiles. The lane-packing and Pallas-fusion attacks both lost to XLA
re-tiling copies, so the remaining lever is architectural: carry FEWER
norm chains at the big levels. ``CondUNet.num_res_blocks`` now accepts a
per-level tuple; this measures full DDPM-1000 sampling (production bf16
sampling policy) for the flagship vs slimmed variants:

  attn256d          (2,2,2,2,2)   round-3 flagship baseline
  attn256s          (1,2,2,2,2)   one ResBlock at the 128² level
  slim12            (1,1,2,2,2)   also slim the 64² level
  slim+deep         (1,2,2,3,3)   reinvest the savings at 16²/8²

Run: python scripts/bench_r3_slim.py > /tmp/r3_slim.jsonl 2>/tmp/r3_slim.log
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T = 1000
BATCH = 16


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure(tag, blocks):
    import jax
    import jax.numpy as jnp
    from superdiff_tpu.diffusion import make_schedule, ddpm_sample
    from superdiff_tpu.models.presets import build_model
    from superdiff_tpu.inference import cast_sampling_params
    from superdiff_tpu.utils.env import host_init

    model = build_model("attn256d", num_classes=2,
                        norm_dtype=jnp.bfloat16,
                        num_res_blocks=blocks)
    shape = (BATCH, 256, 256, 1)
    y = jnp.zeros((BATCH,), dtype=jnp.int32)

    x = jnp.zeros(shape, dtype=jnp.float32)
    t0 = jnp.zeros((BATCH,), dtype=jnp.int32)
    tic = time.time()
    params = host_init(model.init, jax.random.PRNGKey(0), x, t0, y)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    log(f"[{tag}] init {n_params/1e6:.1f}M params in {time.time()-tic:.0f}s")
    params = cast_sampling_params(params)

    schedule = make_schedule(T)
    fn = lambda xx, tt, yy: model.apply(params, xx, tt, yy)
    sample = jax.jit(lambda r: ddpm_sample(
        schedule, fn, shape, r, y=y, guidance_scale=1.0))

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
    rec = {"variant": tag, "blocks": list(blocks), "batch": BATCH,
           "params_m": round(n_params / 1e6, 2),
           "samples_per_sec": round(BATCH / best, 4),
           "ms_per_step": round(best / T * 1e3, 3)}
    print(json.dumps(rec), flush=True)
    log(f"[{tag}] {rec['samples_per_sec']} samples/sec "
        f"({rec['ms_per_step']} ms/step)")
    return rec


def main():
    import jax
    log(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    measure("attn256d", (2, 2, 2, 2, 2))
    measure("attn256s", (1, 2, 2, 2, 2))
    measure("slim12", (1, 1, 2, 2, 2))
    measure("slim+deep", (1, 2, 2, 3, 3))


if __name__ == "__main__":
    main()
