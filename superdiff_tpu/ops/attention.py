"""Self-attention op with a Pallas TPU flash-attention kernel + XLA fallback.

The reference has no attention anywhere in its trainable model (SURVEY.md
§5.7); the flagship CondUNet uses it at low resolutions, and at 256x256 the
flattened sequence is 65k tokens — far beyond a VMEM-resident S x S score
matrix, hence the blockwise (flash) kernel.

Dispatch policy: the Pallas kernel is used on TPU backends when shapes meet
its tiling constraints and ``SUPERDIFF_TPU_DISABLE_PALLAS`` is unset;
otherwise the pure-XLA path (which XLA fuses well for short sequences) runs.
Both paths share one public signature:

    out = multihead_attention(q, k, v)   # (B, S, H, D) each

Numerics: scores accumulate in float32 regardless of input dtype.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray,
                   v: jnp.ndarray) -> jnp.ndarray:
    """Plain softmax attention; fine for short sequences (<= 4k tokens)."""
    dim = q.shape[-1]
    scale = 1.0 / math.sqrt(dim)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _flash_min_s() -> int:
    """Minimum sequence length for the Pallas kernel (overridable for A/B
    measurement via SUPERDIFF_TPU_FLASH_MIN_S). Default 256: measured
    end-to-end on v5e, the flash kernel matches XLA at S=256 and wins above
    (A/B table in BASELINE.md), so the flagship presets' 16² attention
    (S=256) runs through it."""
    return int(os.environ.get("SUPERDIFF_TPU_FLASH_MIN_S", "256"))


def _use_pallas(q: jnp.ndarray) -> bool:
    if os.environ.get("SUPERDIFF_TPU_DISABLE_PALLAS"):
        return False
    if jax.default_backend() != "tpu":
        return False
    B, S, H, D = q.shape
    # Kernel tiling: sequence and head-dim must map onto (128, 128) tiles.
    return S >= _flash_min_s() and S % 128 == 0 and D in (32, 64, 128)


def multihead_attention(q: jnp.ndarray, k: jnp.ndarray,
                        v: jnp.ndarray) -> jnp.ndarray:
    """Multi-head attention, ``(B, S, H, D)`` layout, no masking (images).

    Uses the Pallas flash kernel for long sequences on TPU, XLA otherwise.
    """
    if _use_pallas(q):
        from superdiff_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v)
    return _xla_attention(q, k, v)
