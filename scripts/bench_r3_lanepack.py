"""Round-3 lane-packing microbench: is the norm chain's cost the C=64 tile
padding, and can folding W-pairs into channels (a logically-free NHWC
rearrangement) recover it?

Context: the xplane profile (BASELINE.md round-3 section) attributes 52% of
the flagship step to GroupNorm stats+normalize fusions, dominated by the
128-squared C=64 level where the TPU's (16, 128) bf16 tiling half-pads every
HBM materialization. Hypothesis: the same chain computed on a
(B, H, W/2, 2C=128) view moves half the bytes.

Variants (each a 200-iteration lax.scan over the op, feeding the output back
so nothing is DCE'd; shapes are the flagship's 128-squared level at batch 16):

  ew_64     x*1.0001+0.01 on (16,128,128,64)   pure-traffic control, padded
  ew_128    same ops on (16,128,64,128)         pure-traffic control, packed
  gn_64     GN(32 groups)+FiLM+SiLU on (16,128,128,64)   the indicted chain
  gn_128    identical chain on (16,128,64,128)  same bytes, packed lanes
  gn_fold   input (16,128,128,64); fold W-pairs -> chain on packed view ->
            unfold (semantically identical GN to gn_64; tests whether XLA
            eats the fold as a bitcast or pays a copy)

    python scripts/bench_r3_lanepack.py > /tmp/r3_lanepack.jsonl 2>/tmp/r3_lanepack.log
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 200
B, H, W, C = 16, 128, 128, 64
G = 32  # groups (2 channels/group at C=64, matching num_groups_for(64, 32))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def time_scan(fn, x):
    """Time ITERS applications of fn inside one jitted lax.scan."""
    import jax

    def body(h, _):
        return fn(h), None

    run = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=ITERS)[0])
    tic = time.time()
    jax.block_until_ready(run(x))
    log(f"  compile+first: {time.time() - tic:.1f}s")
    best = float("inf")
    for _ in range(3):
        tic = time.time()
        jax.block_until_ready(run(x))
        best = min(best, time.time() - tic)
    return best / ITERS


def emit(name, sec_per_iter, nbytes):
    # Effective (payload) bandwidth assuming one read + one write of x.
    gbps = 2 * nbytes / sec_per_iter / 1e9
    rec = {"variant": name, "us_per_iter": round(sec_per_iter * 1e6, 1),
           "payload_GBps": round(gbps, 1)}
    print(json.dumps(rec), flush=True)
    log(f"[{name}] {rec['us_per_iter']} us/iter, {gbps:.0f} GB/s payload")


def gn_film_silu(x, groups, fold=False):
    """GroupNorm(groups) + FiLM + SiLU, matching layers.ResBlock's chain.

    With fold=True, stats and the normalize pass run on the W-pair-folded
    (B, H, W/2, 2C) view — numerically identical to the unfolded chain
    (per-group statistics include the same elements either way).
    """
    import jax.numpy as jnp

    b, h, w, c = x.shape
    cg = c // groups
    gamma = jnp.ones((c,), jnp.float32) * 1.01
    beta = jnp.zeros((c,), jnp.float32) + 0.01
    film_scale = jnp.full((b, c), 0.02, jnp.float32)
    film_shift = jnp.full((b, c), 0.01, jnp.float32)

    # Effective affine: gamma*(1+scale) applied to normalized x, plus
    # beta*(1+scale)+shift (the chain GN -> *(1+s) + t collapsed into one).
    eff_scale = gamma[None, :] * (1.0 + film_scale)          # (B, C)
    eff_bias = beta[None, :] * (1.0 + film_scale) + film_shift

    if not fold:
        xs = x.reshape(b, h, w, groups, cg).astype(jnp.float32)
        mean = xs.mean(axis=(1, 2, 4))                        # (B, G)
        var = (xs * xs).mean(axis=(1, 2, 4)) - mean * mean
        rstd = 1.0 / jnp.sqrt(var + 1e-5)
        mu_c = jnp.repeat(mean, cg, axis=1)                   # (B, C)
        rs_c = jnp.repeat(rstd, cg, axis=1)
        scale = (rs_c * eff_scale).astype(x.dtype)[:, None, None, :]
        bias = (eff_bias - mu_c * rs_c * eff_scale).astype(
            x.dtype)[:, None, None, :]
        return jax.nn.silu(x * scale + bias)

    xf = x.reshape(b, h, w // 2, 2 * c)                       # packed lanes
    xs = xf.reshape(b, h, w // 2, 2, groups, cg).astype(jnp.float32)
    mean = xs.mean(axis=(1, 2, 3, 5))                         # (B, G)
    var = (xs * xs).mean(axis=(1, 2, 3, 5)) - mean * mean
    rstd = 1.0 / jnp.sqrt(var + 1e-5)
    mu_c = jnp.repeat(mean, cg, axis=1)                       # (B, C)
    rs_c = jnp.repeat(rstd, cg, axis=1)
    scale2 = jnp.tile(rs_c * eff_scale, (1, 2)).astype(
        x.dtype)[:, None, None, :]                            # (B, 2C)
    bias2 = jnp.tile(eff_bias - mu_c * rs_c * eff_scale, (1, 2)).astype(
        x.dtype)[:, None, None, :]
    y = jax.nn.silu(xf * scale2 + bias2)
    return y.reshape(b, h, w, c)


def main():
    global jax
    import jax
    import jax.numpy as jnp

    log(f"backend: {jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    x64 = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    x128 = jax.random.normal(key, (B, H, W // 2, 2 * C), jnp.bfloat16)
    nbytes = B * H * W * C * 2

    emit("ew_64", time_scan(lambda v: v * 1.0001 + 0.01, x64), nbytes)
    emit("ew_128", time_scan(lambda v: v * 1.0001 + 0.01, x128), nbytes)
    emit("gn_64", time_scan(partial(gn_film_silu, groups=G), x64), nbytes)
    emit("gn_128", time_scan(partial(gn_film_silu, groups=G), x128), nbytes)
    emit("gn_fold", time_scan(partial(gn_film_silu, groups=G, fold=True),
                              x64), nbytes)

    # Parity: folded chain == unfolded chain (same elements per group).
    a = gn_film_silu(x64.astype(jnp.float32), G)
    bf = gn_film_silu(x64.astype(jnp.float32), G, fold=True)
    err = float(jnp.max(jnp.abs(a - bf)))
    log(f"fold-vs-unfold max abs err (f32): {err:.2e}")
    print(json.dumps({"variant": "parity_maxerr", "value": err}), flush=True)


if __name__ == "__main__":
    main()
