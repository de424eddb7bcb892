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
    measurement via SUPERDIFF_TPU_FLASH_MIN_S). Default 1024 — the measured
    end-to-end crossover on a v5e chip (scripts/bench_attention_ab.py, full
    DDPM-1000 sampling, A/B table in BASELINE.md): at S=256 (16² maps) the
    flash kernel is ~3% slower than XLA's fused short-sequence attention,
    at S=1024 (32² maps) it wins — the mixed policy (flash at 32², XLA at
    16²) beat both all-XLA (+3.6%) and all-flash (+2.3%) in the attn256
    preset."""
    return int(os.environ.get("SUPERDIFF_TPU_FLASH_MIN_S", "1024"))


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
