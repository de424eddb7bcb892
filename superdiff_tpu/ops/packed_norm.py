"""Lane-packed GroupNorm(+FiLM)+SiLU chain — XLA-native, no custom kernel.

Why this exists: the round-3 xplane profile (BASELINE.md) shows 52% of the
flagship 256² denoiser step in GroupNorm stats+normalize fusions, dominated
by the 128²-resolution C=64 level. TPU arrays tile their two minor dims as
(sublane, lane) = (16, 128) for bf16; a 64-channel NHWC tensor half-fills
every lane tile, so each normalize pass moves ~2× its payload bytes and the
VPU runs at ≤50% occupancy.

The fix here is a *logical* rearrangement, not a kernel: fold ``f = 128/C``
adjacent W positions into channels, ``(B, H, W, C) -> (B, H, W/f, f*C)``,
run the whole norm→FiLM→SiLU chain on the lane-full view, and unfold. In
row-major NHWC the fold is a contiguous reinterpretation — inside an XLA
fusion it is free; at fusion boundaries XLA re-tiles, which is what this op
trades against the half-empty-tile tax (measured on-chip before enabling:
``scripts/bench_r3_lanepack.py``).

The chain is mathematically identical to
``nn.GroupNorm -> *(1+scale)+shift -> silu`` (same per-group statistics —
folding W into C permutes *within* the reduction set of each (batch, group)
— and the affine collapse gamma*(1+s), beta*(1+s)+t is exact in f32).

Enable with ``SUPERDIFF_TPU_LANE_PACK=1`` (read at trace time, like the
other dispatch knobs in ``ops/``). Stats always reduce in float32.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def _lane_pack_enabled() -> bool:
    return os.environ.get("SUPERDIFF_TPU_LANE_PACK", "0") == "1"


def _fold_factor(W: int, C: int) -> int:
    """Largest f with f*C <= 128, f | W, C*f a multiple of lane-friendly
    sizes. Returns 1 when the tensor is already lane-full (C >= 128)."""
    if C >= 128 or 128 % C:
        return 1
    f = 128 // C
    while f > 1 and W % f:
        f //= 2
    return f


def groupnorm_film_silu(x: jnp.ndarray,
                        gamma: jnp.ndarray,
                        beta: jnp.ndarray,
                        num_groups: int,
                        eps: float = 1e-5,
                        film_scale: Optional[jnp.ndarray] = None,
                        film_shift: Optional[jnp.ndarray] = None,
                        out_dtype: Optional[jnp.dtype] = None,
                        apply_silu: bool = True,
                        pack: Optional[bool] = None) -> jnp.ndarray:
    """GroupNorm + optional FiLM + optional SiLU on NHWC, lane-packable.

    Equivalent to::

        h = nn.GroupNorm(num_groups, epsilon=eps, dtype=out_dtype)(x)
        h = h * (1 + film_scale[:, None, None, :]) \
            + film_shift[:, None, None, :]      # if FiLM given
        h = nn.silu(h)                           # if apply_silu

    ``film_scale``/``film_shift``: per-sample ``(B, C)`` or None.
    ``pack=None`` reads SUPERDIFF_TPU_LANE_PACK; the fold only engages for
    C < 128 with a compatible W, so it is shape-safe to leave on globally.
    """
    B, H, W, C = x.shape
    if C % num_groups:
        raise ValueError(f"channels {C} not divisible by groups {num_groups}")
    cg = C // num_groups
    nd = out_dtype or x.dtype
    if pack is None:
        pack = _lane_pack_enabled()
    f = _fold_factor(W, C) if pack else 1

    # --- per-(batch, group) statistics, reduced in f32 -----------------
    if f > 1:
        xv = x.reshape(B, H, W // f, f, num_groups, cg)
    else:
        xv = x.reshape(B, H, W, 1, num_groups, cg)
    xs = xv.astype(jnp.float32)
    mean = xs.mean(axis=(1, 2, 3, 5))                        # (B, G)
    var = jnp.square(xs).mean(axis=(1, 2, 3, 5)) - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)                          # (B, G)

    # --- collapse GN affine + FiLM into one per-(B, C) scale/bias ------
    gamma = gamma.astype(jnp.float32)[None, :]               # (1, C)
    beta = beta.astype(jnp.float32)[None, :]
    if film_scale is not None:
        g1 = 1.0 + film_scale.astype(jnp.float32)            # (B, C)
        eff_scale = gamma * g1
        eff_bias = beta * g1 + film_shift.astype(jnp.float32)
    else:
        eff_scale = jnp.broadcast_to(gamma, (B, C))
        eff_bias = jnp.broadcast_to(beta, (B, C))
    mu_c = jnp.repeat(mean, cg, axis=1)                      # (B, C)
    rs_c = jnp.repeat(rstd, cg, axis=1)
    a = rs_c * eff_scale                                     # (B, C)
    b = eff_bias - mu_c * a

    # --- one elementwise pass on the (possibly) lane-packed view -------
    if f > 1:
        xf = x.reshape(B, H, W // f, f * C)
        af = jnp.tile(a, (1, f)).astype(nd)[:, None, None, :]
        bf = jnp.tile(b, (1, f)).astype(nd)[:, None, None, :]
        y = xf.astype(nd) * af + bf
        if apply_silu:
            y = jax.nn.silu(y)
        return y.reshape(B, H, W, C)
    y = (x.astype(nd) * a.astype(nd)[:, None, None, :]
         + b.astype(nd)[:, None, None, :])
    if apply_silu:
        y = jax.nn.silu(y)
    return y
