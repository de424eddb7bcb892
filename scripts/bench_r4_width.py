"""Round-4 width-at-128² A/B on the real TPU chip (VERDICT r3 #2).

The round-3 xplane profile (BASELINE.md "where the time actually goes")
pins 52% of the flagship attn256d step on GroupNorm-chain HBM traffic and
explains it structurally: at the 128² level C=64 half-fills the TPU's
native (8, 128) lane tiles, so every norm/elementwise pass moves ~2x its
payload bytes at <=50% VPU occupancy. Round 3 attacked the slice with
depth (slim256), shuffle (fastattn256) and lane-packing (lost to re-tiling
copies) — never with channel WIDTH, which the half-empty-lane theory says
should cut the norm tax while ADDING capacity at the indicted level.

Variants (all attn256d attention policy, pixel_shuffle=2, ~37-40 M params):

  attn256d   base 64,  mults (1,2,2,4,4), blocks (2,2,2,2,2)  flagship ref
  wide256    base 128, mults (1,1,1,2,2), blocks (1,2,2,2,2)  the preset:
             C=128 lane-full at 128², one block there to offset conv FLOPs
  wide-deep  base 128, mults (1,1,1,2,2), blocks (2,2,2,2,2)  full depth —
             isolates how much of wide256's delta is the slim block count
  wide-slim  base 128, mults (1,1,1,2,2), blocks (1,1,2,2,2)  also slim 64²

Measures full DDPM-1000 sampling (production bf16 policy, batch 16) plus a
CPU-lowered FLOP count per variant so the table separates "more FLOPs"
from "better packed".

Run: python scripts/bench_r4_width.py > /tmp/r4_width.jsonl 2>/tmp/r4_width.log
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


def count_flops(model, params, x, t0, y) -> float:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import denoiser_flops
    return denoiser_flops(model, params, x, t0, y)


def prepare(tag, **over):
    """Build + init + FLOP-count one variant. Must run BEFORE any TPU
    execution in this process: the CPU-backend lowering inside
    denoiser_flops fails once the remote plugin has executed (see
    bench.py)."""
    import jax
    import jax.numpy as jnp
    from superdiff_tpu.models.presets import build_model
    from superdiff_tpu.utils.env import host_init

    model = build_model("attn256d", num_classes=2,
                        norm_dtype=jnp.bfloat16, **over)
    shape = (BATCH, 256, 256, 1)
    y = jnp.zeros((BATCH,), dtype=jnp.int32)
    x = jnp.zeros(shape, dtype=jnp.float32)
    t0 = jnp.zeros((BATCH,), dtype=jnp.int32)

    tic = time.time()
    params = host_init(model.init, jax.random.PRNGKey(0), x, t0, y,
                       cache_key=f"r4_width_{tag}")
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    log(f"[{tag}] init {n_params/1e6:.1f}M params in {time.time()-tic:.0f}s")
    flops_step = count_flops(model, params, x, t0, y)
    return dict(tag=tag, model=model, params=params, n_params=n_params,
                flops=flops_step, shape=shape, y=y)


def measure(prep):
    import jax
    import jax.numpy as jnp
    from superdiff_tpu.diffusion import make_schedule, ddpm_sample
    from superdiff_tpu.inference import cast_sampling_params

    tag = prep["tag"]
    model, shape, y = prep["model"], prep["shape"], prep["y"]
    params = cast_sampling_params(prep["params"])

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
    rec = {"variant": tag, "batch": BATCH,
           "params_m": round(prep["n_params"] / 1e6, 2),
           "tflop_per_step": round(prep["flops"] / 1e12, 3),
           "samples_per_sec": round(BATCH / best, 4),
           "ms_per_step": round(best / T * 1e3, 3)}
    print(json.dumps(rec), flush=True)
    log(f"[{tag}] {rec['samples_per_sec']} samples/sec "
        f"({rec['ms_per_step']} ms/step, {rec['tflop_per_step']} TF/step)")
    return rec


VARIANTS = [
    ("attn256d", {}),
    ("wide256", dict(base_channels=128, channel_mults=(1, 1, 1, 2, 2),
                     num_res_blocks=(1, 2, 2, 2, 2))),
    ("wide-deep", dict(base_channels=128, channel_mults=(1, 1, 1, 2, 2),
                       num_res_blocks=(2, 2, 2, 2, 2))),
    ("wide-slim", dict(base_channels=128, channel_mults=(1, 1, 1, 2, 2),
                       num_res_blocks=(1, 1, 2, 2, 2))),
    # round-5 stretch (VERDICT r4 #8): the flagship with FULL-IMAGE-scale
    # attention at the 64-per-side level (S=4096 — the regime where the
    # Pallas bwd measured 2x XLA); only the flash kernel makes this
    # trainable/sampleable at production batch
    ("wide-attn64", dict(base_channels=128, channel_mults=(1, 1, 1, 2, 2),
                         num_res_blocks=(1, 2, 2, 2, 2),
                         attn_resolutions=(64, 32, 16))),
]


def main():
    import jax
    only = os.environ.get("ONLY")
    variants = [(t, o) for t, o in VARIANTS
                if only is None or t in only.split(",")]
    log(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    preps = [prepare(tag, **over) for tag, over in variants]
    for prep in preps:
        measure(prep)


if __name__ == "__main__":
    main()
