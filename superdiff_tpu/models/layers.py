"""Shared Flax building blocks for the diffusion UNets (NHWC, TPU layout).

Everything here is written NHWC — the TPU-native convolution layout — with an
explicit ``compute_dtype`` so the hot path runs bfloat16 on the MXU while
parameters and normalization statistics stay float32.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_time_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Transformer-style sinusoidal embedding of integer/float timesteps.

    Matches the reference's formula exactly (``src/models/unet.py:13-16``):
    frequencies ``exp(-log(1e4) * i / (half - 1))``, output
    ``concat(sin, cos)``. ``t``: shape ``(B,)`` -> ``(B, dim)`` float32.
    """
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32)
        * -(math.log(10000.0) / (half - 1)))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class TimeEmbeddingMLP(nn.Module):
    """Sinusoidal embedding -> Linear -> SiLU -> Linear.

    Reference: ``src/models/unet.py:40-45`` (dim -> 4*dim -> dim). The
    flagship UNet uses ``out_dim = 4*dim`` instead (wider conditioning).
    """
    dim: int
    out_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        out_dim = self.out_dim or self.dim
        h = sinusoidal_time_embedding(t, self.dim)
        h = nn.Dense(self.dim * 4, dtype=self.dtype, name="dense_0")(h)
        h = nn.silu(h)
        h = nn.Dense(out_dim, dtype=self.dtype, name="dense_1")(h)
        return h


def num_groups_for(channels: int, max_groups: int) -> int:
    """Largest group count <= max_groups that divides ``channels`` (skip
    concats produce counts like 48 where min() alone is not a divisor)."""
    g = min(max_groups, channels)
    while channels % g:
        g -= 1
    return g


class GroupNormSiLU(nn.Module):
    """GroupNorm + optional FiLM + SiLU, via the fused Pallas kernel.

    Parameter structure matches ``nn.GroupNorm`` (``scale``/``bias`` leaves)
    so checkpoints are interchangeable with the unfused layout. With
    ``fused=True`` the op dispatches to the single-pass Pallas kernel on TPU
    (``ops/fused_norm.py``); otherwise (and on any non-TPU backend, and for
    pjit-partitioned multi-chip training, where an opaque kernel would block
    the SPMD partitioner) it runs the mathematically identical XLA path.

    NOT used by the production CondUNet: measured end-to-end the kernel's
    layout pinning breaks XLA's conv fusion and loses 10.4 -> 19.7 ms/step
    (ops/fused_norm.py docstring), and the round-3 bf16 ``norm_dtype``
    policy captures the norm-pass HBM saving inside XLA's own fusion.
    Kept as the documented opt-in wrapper for custom models.
    """
    num_groups: int
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 film_scale: Optional[jnp.ndarray] = None,
                 film_shift: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from superdiff_tpu.ops.fused_norm import fused_groupnorm_silu

        C = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return fused_groupnorm_silu(
            x, gamma, beta, self.num_groups, film_scale, film_shift,
            force=None if self.fused else "xla")


class NormAct(nn.Module):
    """GroupNorm (+ optional FiLM) + SiLU via the lane-packed XLA chain
    (``ops/packed_norm.py``): for C < 128 tensors the elementwise/reduce
    passes run on a W-folded lane-full view, halving the tile-padding HBM
    tax the round-3 profile charges to the 128² C=64 norm chains. Parameter
    layout identical to ``nn.GroupNorm`` (``scale``/``bias``), so
    checkpoints are interchangeable with the unfused modules.

    Standalone, parity-tested op wrapper only: the on-chip end-to-end A/B
    (BASELINE.md round-3 lane-pack table) measured the folded chain ~20%
    SLOWER inside the full UNet — the fold/unfold land on fusion boundaries
    around the convs, and the re-tiling copies cost more than the
    half-empty-tile tax they remove. The production ResBlock/UNet carry no
    dispatch to it (same resolution as ``ops/fused_norm.py``)."""
    num_groups: int
    dtype: jnp.dtype = jnp.float32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 film_scale: Optional[jnp.ndarray] = None,
                 film_shift: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from superdiff_tpu.ops.packed_norm import groupnorm_film_silu

        C = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return groupnorm_film_silu(
            x, gamma, beta, self.num_groups, eps=self.epsilon,
            film_scale=film_scale, film_shift=film_shift,
            out_dtype=self.dtype, pack=True)


class ResBlock(nn.Module):
    """DDPM residual block with FiLM (scale-shift) conditioning.

    The real thing the reference's ``ResidualBlock`` (``src/models/unet.py:
    18-35``) gestures at but lacks: an actual residual connection, and
    scale-shift conditioning (Improved DDPM, arXiv:2102.09672 app. A) instead
    of a plain additive bias. The norm->(FiLM)->SiLU prologues run as plain
    XLA ops (bf16 under the inference ``norm_dtype`` policy, which XLA
    fuses into the surrounding convs — measured faster than both the
    standalone fused Pallas kernel (see :class:`GroupNormSiLU`) and the
    lane-packed W-fold chain (``ops/packed_norm.py``; on-chip e2e A/B in
    BASELINE.md lost ~20%, so the model path carries no dispatch for it).
    """
    out_channels: int
    compute_dtype: jnp.dtype = jnp.float32
    groups: int = 32
    dropout: float = 0.0
    norm_dtype: jnp.dtype = jnp.float32  # bf16 halves norm-pass HBM traffic
                                         # (stats still reduce in f32 inside
                                         # flax); use for inference only

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        in_ch = x.shape[-1]
        g1 = num_groups_for(in_ch, self.groups)
        g2 = num_groups_for(self.out_channels, self.groups)
        nd = self.norm_dtype

        h = nn.GroupNorm(num_groups=g1, epsilon=1e-5, dtype=nd,
                         name="norm_0")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.compute_dtype,
                    name="conv_0")(h.astype(self.compute_dtype))

        # FiLM: emb -> (scale, shift), applied after the second norm.
        cond = nn.Dense(2 * self.out_channels, dtype=jnp.float32,
                        name="emb_proj")(nn.silu(emb.astype(jnp.float32)))
        scale, shift = jnp.split(cond, 2, axis=-1)          # (B, C) each

        h = nn.GroupNorm(num_groups=g2, epsilon=1e-5, dtype=nd,
                         name="norm_1")(h)
        h = (h * (1.0 + scale.astype(nd)[:, None, None, :])
             + shift.astype(nd)[:, None, None, :])
        h = nn.silu(h)
        h = h.astype(self.compute_dtype)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.compute_dtype,
                    kernel_init=nn.initializers.zeros, name="conv_1")(h)

        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.compute_dtype,
                        name="skip_proj")(x.astype(self.compute_dtype))
        return (x + h).astype(self.compute_dtype)


class SelfAttention2D(nn.Module):
    """Multi-head self-attention over flattened spatial positions.

    Used at low resolutions in the flagship UNet (the reference has no
    attention at all — SURVEY.md §5.7). Dispatches to the fused Pallas flash
    attention kernel on TPU when profitable, with a pure-XLA fallback.
    """
    num_heads: int = 4
    compute_dtype: jnp.dtype = jnp.float32
    norm_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from superdiff_tpu.ops.attention import multihead_attention

        B, H, W, C = x.shape
        assert C % self.num_heads == 0, (C, self.num_heads)
        h = nn.GroupNorm(num_groups=num_groups_for(C, 32), epsilon=1e-5,
                         dtype=self.norm_dtype, name="norm")(x)
        h = h.astype(self.compute_dtype).reshape(B, H * W, C)
        qkv = nn.Dense(3 * C, dtype=self.compute_dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = C // self.num_heads
        split_heads = lambda a: a.reshape(B, H * W, self.num_heads, hd)
        out = multihead_attention(split_heads(q), split_heads(k),
                                  split_heads(v))
        out = out.reshape(B, H * W, C)
        out = nn.Dense(C, dtype=self.compute_dtype,
                       kernel_init=nn.initializers.zeros, name="proj")(out)
        return x + out.reshape(B, H, W, C)


class Downsample(nn.Module):
    """Stride-2 conv downsampling (keeps channels)."""
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2),
                       dtype=self.compute_dtype, name="conv")(x)


class Upsample(nn.Module):
    """Nearest-neighbor 2x upsample + 3x3 conv."""
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
        return nn.Conv(C, (3, 3), dtype=self.compute_dtype, name="conv")(x)
