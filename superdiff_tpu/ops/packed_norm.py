"""Lane-packed GroupNorm(+FiLM)+SiLU chain — XLA-native, no custom kernel.

Covers the same reference chain as ``ops/fused_norm.py``: the GN/SiLU
prologue of every UNet block (``/root/reference/src/models/unet.py:24-31``),
extended with FiLM conditioning for the flagship CondUNet.

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
— and the affine collapse gamma*(1+s), beta*(1+s)+t is exact in f32). The
unfolded path *is* ``ops/fused_norm._xla_gn_silu`` (one shared core); the
folded path repeats its exact op sequence on the folded view, including the
``max(var, 0)`` clamp that keeps near-constant activations finite under
single-pass E[x²]-E[x]² statistics.

Verdict (round-3 on-chip e2e A/B, BASELINE.md lane-pack table): inside the
full UNet the folded chain is ~20% SLOWER (attn256d 9.46 -> 11.40 ms/step,
eff256 8.62 -> 10.56) — the fold/unfold sit on fusion boundaries against
the neighboring convs, and XLA's re-tiling copies there cost more than the
half-empty-tile tax they remove. Same resolution as ``ops/fused_norm.py``:
the op stays as a parity-tested standalone (``models/layers.NormAct``
wraps it; value+grad parity in tests/test_ops.py), and the production
model path carries no dispatch to it. ``SUPERDIFF_TPU_LANE_PACK=1`` only
affects direct callers that leave ``pack=None``. Stats always reduce in
float32.
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
                        pack: Optional[bool] = None) -> jnp.ndarray:
    """GroupNorm + optional FiLM + SiLU on NHWC, lane-packable.

    Equivalent to::

        h = nn.GroupNorm(num_groups, epsilon=eps, dtype=out_dtype)(x)
        h = h * (1 + film_scale[:, None, None, :]) \
            + film_shift[:, None, None, :]      # if FiLM given
        h = nn.silu(h)

    ``film_scale``/``film_shift``: per-sample ``(B, C)`` or None.
    ``pack=None`` reads SUPERDIFF_TPU_LANE_PACK; the fold only engages for
    C < 128 with a compatible W, so it is shape-safe to leave on globally.
    """
    from superdiff_tpu.ops.fused_norm import _xla_gn_silu

    B, H, W, C = x.shape
    if C % num_groups:
        raise ValueError(f"channels {C} not divisible by groups {num_groups}")
    cg = C // num_groups
    nd = out_dtype or x.dtype
    if pack is None:
        pack = _lane_pack_enabled()
    f = _fold_factor(W, C) if pack else 1

    if f == 1:
        return _xla_gn_silu(x, gamma, beta, film_scale, film_shift,
                            num_groups, eps, out_dtype=nd)

    # Folded path: _xla_gn_silu's op sequence on the (B, H, W/f, f*C)
    # lane-full view. Statistics are identical (the fold permutes elements
    # within each (batch, group) reduction set).
    xf = x.reshape(B, H, W // f, f * C)
    x32 = xf.astype(jnp.float32)
    xg = x32.reshape(B, H, W // f, f, num_groups, cg)
    mean = jnp.mean(xg, axis=(1, 2, 3, 5))                    # (B, G)
    mean2 = jnp.mean(xg * xg, axis=(1, 2, 3, 5))
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    mean_c = jnp.repeat(mean, cg, axis=-1)                    # (B, C)
    inv_c = jnp.repeat(jax.lax.rsqrt(var + eps), cg, axis=-1)
    mul = inv_c * gamma.astype(jnp.float32)
    off = beta.astype(jnp.float32) - mean_c * mul
    if film_scale is not None:
        fs = 1.0 + film_scale.astype(jnp.float32)
        mul = mul * fs
        off = off * fs + film_shift.astype(jnp.float32)
    mul_f = jnp.tile(mul, (1, f))[:, None, None, :]           # (B,1,1,fC)
    off_f = jnp.tile(off, (1, f))[:, None, None, :]
    y = x32 * mul_f + off_f
    y = (y * jax.nn.sigmoid(y)).astype(nd)
    return y.reshape(B, H, W, C)
