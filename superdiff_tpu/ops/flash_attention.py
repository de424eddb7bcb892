"""Blockwise (flash) self-attention Pallas kernel for TPU.

Why: at 256x256 the CondUNet's flattened attention sequence is 65 536 tokens;
an S x S score matrix (65k² f32 per head) can never exist - measured,
not prose: S=65 536 forward executes at 77 ms/apply (29% MFU) on one
v5e chip and the kernel beats XLA 2.1-2.2x at S=16 384 fwd/fwd+bwd
(BASELINE.md round-4 long-sequence ledger). The classic online-
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

Backward: a matching pair of Pallas kernels (the Dao et al. recomputation
scheme). The forward additionally emits the per-row logsumexp; backward
recomputes the probability blocks from ``(q, k, lse)`` instead of storing
the S x S matrix, and accumulates

    dv += p^T  @ do
    ds  = p * (do @ v^T - delta) * scale      delta = rowsum(do * o)
    dq += ds @ k          (grid: K innermost, dq block resident in VMEM)
    dk += ds^T @ q        (grid: Q innermost, dk/dv blocks resident)

so HBM traffic stays O(S·D) in both directions and training can run
attention at S >= 4096 where the XLA vjp would materialize the score
matrix. Dispatch: Pallas bwd on the TPU backend (or when
``SUPERDIFF_TPU_FLASH_BWD=pallas`` forces it, e.g. under interpret mode
for CPU parity tests); ``SUPERDIFF_TPU_FLASH_BWD=xla`` opts back into the
XLA attention vjp.

No counterpart exists in the reference (pure conv model,
``src/models/unet.py:37-65``); this is north-star capability (SURVEY.md §5.7).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr,
                  acc_scr, *, scale: float, num_k_blocks: int):
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
        # lse carried as (BH, S, 1): a (1, BQ) block would violate the
        # Mosaic tiling rule (sublane dim of the block must be 8-divisible
        # or equal the array dim); with the trailing singleton the block is
        # (1, BQ, 1) -> last two dims (BQ, 1) are (8-divisible, ==array).
        lse_ref[0] = m_scr[:, :1] + jnp.log(l_scr[:, :1])   # (BQ, 1)


def _pick_blocks(S: int):
    """(block_q, block_k) tile sizes; overridable for A/B measurement via
    SUPERDIFF_TPU_FLASH_BQ / SUPERDIFF_TPU_FLASH_BK (clamped to divisors
    of S). Defaults 512/1024, the best point of the round-3 on-chip sweep
    (scripts/bench_r3_tuning.py): at S=1024 the whole K/V fits one block,
    so the online-softmax rescale never runs and attn256 end-to-end went
    12.57 -> 10.97 ms/step (+15%) over the old 256/512. VMEM stays ~1 MB
    (q 512x64 + k/v 1024x64 bf16 + f32 scratch), far under budget."""
    block_q = int(os.environ.get("SUPERDIFF_TPU_FLASH_BQ", "512"))
    block_k = int(os.environ.get("SUPERDIFF_TPU_FLASH_BK", "1024"))
    if block_q < 1 or block_k < 1:
        raise ValueError("SUPERDIFF_TPU_FLASH_BQ/BK must be >= 1, got "
                         f"{block_q}/{block_k}")
    block_q = min(block_q, S)
    block_k = min(block_k, S)
    while S % block_k:
        block_k //= 2
    while S % block_q:
        block_q //= 2
    return block_q, block_k


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def flash_attention(q: jnp.ndarray, k: jnp.ndarray,
                    v: jnp.ndarray) -> jnp.ndarray:
    """Flash attention, ``(B, S, H, D)`` -> ``(B, S, H, D)``, no mask."""
    return _flash_forward(q, k, v)[0]


def _to_bh(a):
    B, S, H, D = a.shape
    return a.transpose(0, 2, 1, 3).reshape(B * H, S, D)


def _from_bh(a, B, H):
    BH, S, D = a.shape
    return a.reshape(B, H, S, D).transpose(0, 2, 1, 3)


def _flash_forward(q, k, v):
    """Returns ``(out (B,S,H,D), lse (B*H, S, 1) f32)`` — lse is the
    per-row logsumexp of the scaled scores, the residual the backward
    kernels need to recompute probability blocks."""
    B, S, H, D = q.shape
    scale = 1.0 / math.sqrt(D)

    qb, kb, vb = _to_bh(q), _to_bh(k), _to_bh(v)
    block_q, block_k = _pick_blocks(S)
    nq, nk = S // block_q, S // block_k

    grid = (B * H, nq, nk)
    out, lse = pl.pallas_call(
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
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, S, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, S, 1), jnp.float32),
        ],
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
    return _from_bh(out, B, H), lse


# ------------------------------------------------------------- backward ---

def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, dq_scr, *, scale: float, num_k_blocks: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]                                         # (BQ, D)
    k = k_ref[0]                                         # (BK, D)
    v = v_ref[0]                                         # (BK, D)
    do = do_ref[0]                                       # (BQ, D)
    lse = lse_ref[0]                                     # (BQ, 1) f32
    delta = delta_ref[0]                                 # (BQ, 1) f32

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # (BQ, BK)
    p = jnp.exp(s - lse)                                 # (BQ, BK) f32
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (BQ, BK)
    ds = (p * (dp - delta) * scale).astype(k.dtype)      # (BQ, BK)
    dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (BQ, D)

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, dk_scr, dv_scr, *,
                          scale: float, num_q_blocks: int):
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]                                         # (BQ, D)
    k = k_ref[0]                                         # (BK, D)
    v = v_ref[0]                                         # (BK, D)
    do = do_ref[0]                                       # (BQ, D)
    lse = lse_ref[0]                                     # (BQ, 1) f32
    delta = delta_ref[0]                                 # (BQ, 1) f32

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # (BQ, BK)
    p = jnp.exp(s - lse)                                 # (BQ, BK) f32
    pt = p.astype(v.dtype)
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        pt, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (BK, D)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (BQ, BK)
    ds = (p * (dp - delta) * scale).astype(q.dtype)      # (BQ, BK)
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (BK, D)

    @pl.when(qi == num_q_blocks - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, o, lse, g):
    """Pallas backward pass: ``(dq, dk, dv)`` with O(S·D) HBM traffic."""
    B, S, H, D = q.shape
    scale = 1.0 / math.sqrt(D)

    qb, kb, vb = _to_bh(q), _to_bh(k), _to_bh(v)
    ob, gb = _to_bh(o), _to_bh(g)
    # delta_i = rowsum(dO_i * O_i): one cheap fused elementwise+reduce in
    # XLA; everything S x S stays inside the kernels. (BH, S, 1) layout —
    # see the lse note in the forward kernel.
    delta = jnp.sum(gb.astype(jnp.float32) * ob.astype(jnp.float32),
                    axis=-1, keepdims=True)              # (BH, S, 1) f32

    block_q, block_k = _pick_blocks(S)
    nq, nk = S // block_q, S // block_k
    BH = B * H

    q_spec = pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0),
                          memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale,
                          num_k_blocks=nk),
        grid=(BH, nq, nk),
        in_specs=[q_spec, k_spec, k_spec, q_spec, row_spec, row_spec],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, S, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * BH * S * S * D,
            bytes_accessed=5 * BH * S * D * q.dtype.itemsize,
            transcendentals=BH * S * S,
        ),
    )(qb, kb, vb, gb, lse, delta)

    # dk/dv: swap the roles — K blocks resident, Q innermost.
    qi_spec = pl.BlockSpec((1, block_q, D), lambda b, j, i: (b, i, 0),
                           memory_space=pltpu.VMEM)
    rowi_spec = pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
    kj_spec = pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0),
                           memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale,
                          num_q_blocks=nq),
        grid=(BH, nk, nq),
        in_specs=[qi_spec, kj_spec, kj_spec, qi_spec, rowi_spec, rowi_spec],
        out_specs=[kj_spec, kj_spec],
        out_shape=[jax.ShapeDtypeStruct((BH, S, D), k.dtype),
                   jax.ShapeDtypeStruct((BH, S, D), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, D), jnp.float32),
                        pltpu.VMEM((block_k, D), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=8 * BH * S * S * D,
            bytes_accessed=6 * BH * S * D * q.dtype.itemsize,
            transcendentals=BH * S * S,
        ),
    )(qb, kb, vb, gb, lse, delta)

    return (_from_bh(dq, B, H), _from_bh(dk, B, H), _from_bh(dv, B, H))


def _bwd_uses_pallas() -> bool:
    forced = os.environ.get("SUPERDIFF_TPU_FLASH_BWD")
    if forced == "pallas":
        return True
    if forced == "xla":
        return False
    return jax.default_backend() == "tpu"


def _flash_fwd_rule(q, k, v):
    out, lse = _flash_forward(q, k, v)
    # The backward-path choice is static per process (env knob + backend),
    # so decide it here too and only retain out/lse when the Pallas
    # backward will actually consume them — the XLA-vjp fallback recomputes
    # attention from (q, k, v) alone, and keeping the extra (B,S,H,D) + lse
    # residuals alive across fwd->bwd would waste activation memory on
    # exactly the backends that take that path.
    if _bwd_uses_pallas():
        return out, (q, k, v, out, lse)
    return out, (q, k, v, None, None)


def _flash_bwd_rule(residuals, g):
    q, k, v, o, lse = residuals
    if _bwd_uses_pallas() and o is not None:
        return _flash_backward(q, k, v, o, lse, g)
    from superdiff_tpu.ops.attention import _xla_attention
    _, vjp = jax.vjp(_xla_attention, q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)
