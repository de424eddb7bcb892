"""Blockwise (flash) self-attention Pallas kernel for TPU.

Why: at 256x256 the CondUNet's flattened attention sequence is 65 536 tokens;
an S x S score matrix (65k² f32 = 17 GB) can never exist. The classic online-
softmax formulation (Dao et al.) streams K/V blocks through VMEM while
carrying running (max, sum, accumulator) statistics, so HBM traffic is
O(S·D) instead of O(S²).

Kernel layout:
- inputs reshaped to ``(BH, S, D)`` (batch*heads fused into the grid),
- grid ``(BH, S/BLOCK_Q, S/BLOCK_K)`` — the K axis is innermost and iterates
  sequentially on TPU, so the f32 accumulators live in VMEM scratch and
  persist across K steps; Pallas double-buffers the HBM->VMEM block DMAs,
- scores/accumulation in float32 (MXU ``preferred_element_type``), inputs may
  be bfloat16,
- no masking (image tokens; no causality).

Backward: gradients fall back to the XLA attention vjp via ``jax.custom_vjp``
— training only uses attention at short sequence lengths (16², 8² feature
maps) where the XLA path is used anyway; the Pallas path is the sampling hot
loop, which is grad-free.

No counterpart exists in the reference (pure conv model,
``src/models/unet.py:37-65``); this is north-star capability (SURVEY.md §5.7).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  scale: float, num_k_blocks: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                      # (BQ, D)
    k = k_ref[0]                      # (BK, D)
    v = v_ref[0]                      # (BK, D)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # (BQ, BK) f32

    m_prev = m_scr[:, :1]                                # (BQ, 1)
    l_prev = l_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)                      # (BQ, 1)
    p = jnp.exp(s - m_new)                               # (BQ, BK) f32
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (BQ, D) f32
    acc_scr[:] = acc_scr[:] * alpha + pv

    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def flash_attention(q: jnp.ndarray, k: jnp.ndarray,
                    v: jnp.ndarray) -> jnp.ndarray:
    """Flash attention, ``(B, S, H, D)`` -> ``(B, S, H, D)``, no mask."""
    return _flash_forward(q, k, v)


def _flash_forward(q, k, v):
    B, S, H, D = q.shape
    scale = 1.0 / math.sqrt(D)

    to_bh = lambda a: a.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    block_q = min(256, S)
    block_k = min(512, S)
    while S % block_k:
        block_k //= 2
    while S % block_q:
        block_q //= 2
    nq, nk = S // block_q, S // block_k

    grid = (B * H, nq, nk)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, num_k_blocks=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, qi, ki: (b, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, S, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),   # running max
            pltpu.VMEM((block_q, 128), jnp.float32),   # running sum
            pltpu.VMEM((block_q, D), jnp.float32),     # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * S * D,
            bytes_accessed=3 * B * H * S * D * q.dtype.itemsize
            + B * H * S * D * q.dtype.itemsize,
            transcendentals=B * H * S * S,
        ),
    )(qb, kb, vb)
    return out.reshape(B, H, S, D).transpose(0, 2, 1, 3)


def _flash_fwd_rule(q, k, v):
    return _flash_forward(q, k, v), (q, k, v)


def _flash_bwd_rule(residuals, g):
    from superdiff_tpu.ops.attention import _xla_attention
    q, k, v = residuals
    _, vjp = jax.vjp(_xla_attention, q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)
