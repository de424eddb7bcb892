"""Fused GroupNorm(+FiLM)+SiLU Pallas kernel for TPU.

The ResBlock hot path (``models/layers.py``) runs GroupNorm -> FiLM
scale-shift -> SiLU before each conv. Unfused, XLA materializes the f32
normalized tensor between the statistics pass and the apply pass; this
kernel does one HBM read and one write per activation in the storage dtype
(bf16 on the sampling path), keeping statistics and the SiLU in VMEM
registers — the "fused resblock epilogue" item of the build plan
(SURVEY.md §7.2.8). The reference has no custom kernels at all
(SURVEY.md §2.1); its GN+SiLU is torch's two eager ops
(``src/models/unet.py:24-31``).

Design (one grid cell = one (batch, channel-chunk) pair, fully parallel):
- block ``(1, H, W, chunk)`` with the whole spatial extent resident; the
  chunk is the largest divisor of C that is a multiple of the group width
  and fits the VMEM budget,
- per-channel sum / sum-of-squares via a sublane reduction (f32),
- per-*group* statistics from the per-channel sums with a tiny
  ``(chunk, chunk)`` block-diagonal averaging matmul built from lane iota
  in-kernel — lane-subrange reductions are awkward on the VPU; the MXU does
  this for free,
- normalize, FiLM (``y * (1 + scale) + shift``), SiLU, cast, write.

Backward falls back to the XLA reference implementation via
``jax.custom_vjp`` (training-path grads take the XLA route; sampling — the
hot loop — is grad-free). Use ``fused_groupnorm_silu(..., force="xla")`` to
bypass, ``force="pallas"`` + ``interpret=True`` for CPU parity tests.

Measured status (v5e, 2026-08, round 2): the kernel beats the equivalent
standalone XLA subgraph ~2x in isolation (2.3 ms vs 4.6 ms for
(16,128,128,64) bf16 incl. dispatch overhead), but *loses end-to-end
inside the UNet* — eff256 DDPM sampling goes 10.4 -> 19.7 ms/step with it
enabled, because the opaque custom call pins operand layouts (copies
appear around every call) and breaks XLA's producer/consumer fusion with
the surrounding convolutions. Round 3 resolved this (VERDICT r2 #8): the
norm-pass HBM saving the kernel was after is captured INSIDE XLA's own
fusion by the bf16 ``norm_dtype`` inference policy (+15% end-to-end,
BASELINE.md round-3 table), so the CondUNet no longer carries a dispatch
branch for this kernel at all. The op remains a standalone, parity-tested
building block (``models.layers.GroupNormSiLU`` wraps it) for
standalone-norm workloads where no conv fusion is at stake.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-block VMEM budget for the activation block (bytes). Conservative:
# with the f32 temporaries and double buffering this stays well under the
# ~16 MB/core of VMEM.
_BLOCK_BUDGET = 2 * 1024 * 1024


def _chunk_channels(C: int, group_width: int, hw: int, itemsize: int) -> int:
    """Largest channel chunk satisfying every constraint; 0 if none does.

    Constraints: divisor of C; multiple of ``group_width`` (group stats
    stay chunk-local); 128-divisible OR the full C (Mosaic tiling needs the
    trailing block dim lane-aligned or whole); fits the VMEM budget.
    """
    best = 0
    for c in range(group_width, C + 1, group_width):
        if C % c:
            continue
        if c != C and c % 128:
            continue
        if hw * c * itemsize <= _BLOCK_BUDGET:
            best = max(best, c)
    return best


def _gn_silu_kernel(x_ref, gamma_ref, beta_ref, scale_ref, shift_ref, o_ref,
                    *, group_width: int, eps: float, film: bool):
    chunk = x_ref.shape[-1]
    H, W = x_ref.shape[1], x_ref.shape[2]
    hw = H * W
    # The whole (H, W, chunk) slab is VMEM-resident (_chunk_channels caps
    # the block at _BLOCK_BUDGET), so the kernel is straight-line — an
    # in-kernel fori_loop over spatial tiles measured 2-3x slower (it
    # serializes small VPU ops).
    x = x_ref[0].reshape(hw, chunk)

    # Statistics via MXU dots: storage-dtype (bf16) operands, f32
    # accumulation — no f32 copy (and no x*x buffer) ever materializes.
    # sum(x^2) per channel is the diagonal of the x^T x Gram matrix.
    ones = jnp.ones((8, hw), dtype=x_ref.dtype)
    s1 = jax.lax.dot(ones, x, preferred_element_type=jnp.float32)
    gram = jax.lax.dot_general(
        x, x, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    ci = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    s2 = jnp.sum(jnp.where(ci == cj, gram, 0.0), axis=0,
                 keepdims=True)                                # (1, chunk)

    # Block-diagonal group-averaging matrix: A[i, j] = 1/(hw*gw) iff i, j in
    # the same group. (s1 @ A)[c] is then the group mean for c's group.
    avg = jnp.where(ci // group_width == cj // group_width,
                    1.0 / (hw * group_width), 0.0)

    mean = jax.lax.dot(s1[:1], avg, preferred_element_type=jnp.float32)
    ex2 = jax.lax.dot(s2, avg, preferred_element_type=jnp.float32)
    inv = jax.lax.rsqrt(ex2 - mean * mean + eps)               # (1, chunk)

    g = gamma_ref[0].reshape(1, chunk).astype(jnp.float32)
    b = beta_ref[0].reshape(1, chunk).astype(jnp.float32)
    # Fold the affine chain into one per-channel multiplier and offset so
    # the big-tensor math is a single fused multiply-add (computed in the
    # storage dtype; the per-channel scalars stay f32 until the last cast).
    mul = inv * g                                              # (1, chunk)
    off = b - mean * mul
    if film:
        fs = 1.0 + scale_ref[0].reshape(1, chunk)
        mul = mul * fs
        off = off * fs + shift_ref[0].reshape(1, chunk)
    y = x * mul.astype(x_ref.dtype) + off.astype(x_ref.dtype)
    # SiLU via explicit exp: Mosaic's `logistic` lowering mis-broadcasts
    # an f32 scalar into bf16 vectors (verifier error); exp is clean.
    y = y / (jnp.exp(-y) + jnp.asarray(1.0, x_ref.dtype))
    o_ref[0] = y.reshape(H, W, chunk).astype(o_ref.dtype)


def _pallas_gn_silu(x, gamma, beta, scale, shift, num_groups: int,
                    eps: float, chunk: int, interpret: bool):
    B, H, W, C = x.shape
    gw = C // num_groups
    film = scale is not None
    if not film:  # dummy operands keep one kernel signature
        scale = jnp.zeros((B, C), jnp.float32)
        shift = jnp.zeros((B, C), jnp.float32)
    grid = (B, C // chunk)
    kernel = functools.partial(_gn_silu_kernel, group_width=gw, eps=eps,
                               film=film)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, W, chunk), lambda b, c: (b, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda b, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda b, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, chunk), lambda b, c: (b, 0, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # Whole-block temporaries exceed the 16 MB scoped-VMEM default;
            # v5e tolerates a raised limit and the working set fits.
            vmem_limit_bytes=34 * 1024 * 1024),
    )(x, gamma.reshape(1, C), beta.reshape(1, C),
      scale.astype(jnp.float32).reshape(B, 1, C),
      shift.astype(jnp.float32).reshape(B, 1, C))


def _xla_gn_silu(x, gamma, beta, scale, shift, num_groups: int, eps: float,
                 out_dtype=None):
    """Reference implementation (also the vjp path).

    Single-pass statistics (E[x^2] - E[x]^2, like flax's ``_compute_stats``)
    so XLA fuses sum and sum-of-squares into one read — ``jnp.var`` alone
    costs a separate mean pass and measurably slows the whole UNet.
    """
    B, H, W, C = x.shape
    gw = C // num_groups
    x32 = x.astype(jnp.float32)
    xg = x32.reshape(B, H, W, num_groups, gw)
    mean = jnp.mean(xg, axis=(1, 2, 4))                        # (B, G)
    mean2 = jnp.mean(xg * xg, axis=(1, 2, 4))
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    # Fold GN affine + FiLM into one per-(batch, channel) multiplier and
    # offset, then apply a single FMA in the native NHWC layout — the
    # grouped 5-D shape has a tiny trailing (lane) dim and is only used for
    # the reductions above.
    mean_c = jnp.repeat(mean, gw, axis=-1)                     # (B, C)
    inv_c = jnp.repeat(jax.lax.rsqrt(var + eps), gw, axis=-1)
    mul = inv_c * gamma.astype(jnp.float32)
    off = beta.astype(jnp.float32) - mean_c * mul
    if scale is not None:
        fs = 1.0 + scale.astype(jnp.float32)
        mul = mul * fs
        off = off * fs + shift.astype(jnp.float32)
    y = x32 * mul[:, None, None, :] + off[:, None, None, :]
    return (y * jax.nn.sigmoid(y)).astype(out_dtype or x.dtype)


def fused_groupnorm_silu(x: jnp.ndarray,
                         gamma: jnp.ndarray,
                         beta: jnp.ndarray,
                         num_groups: int,
                         scale: Optional[jnp.ndarray] = None,
                         shift: Optional[jnp.ndarray] = None,
                         eps: float = 1e-5,
                         force: Optional[str] = None,
                         interpret: bool = False) -> jnp.ndarray:
    """``SiLU(FiLM(GroupNorm(x)))`` in one pass.

    ``x``: (B, H, W, C) any float dtype; ``gamma``/``beta``: (C,) GN affine;
    ``scale``/``shift``: optional (B, C) FiLM conditioning. Statistics are
    always f32. ``force``: "pallas" | "xla" | None (auto: Pallas on TPU when
    the shape is eligible).
    """
    B, H, W, C = x.shape
    if C % num_groups:
        raise ValueError(f"C={C} not divisible by num_groups={num_groups}")
    if (scale is None) != (shift is None):
        raise ValueError("scale and shift must be given together")

    use_pallas = force == "pallas"
    chunk = _chunk_channels(C, C // num_groups, H * W, x.dtype.itemsize)
    if force is None:
        import os
        use_pallas = (jax.default_backend() == "tpu" and chunk > 0
                      and H * W >= 256
                      and len(jax.devices()) == 1
                      and not os.environ.get("SUPERDIFF_TPU_DISABLE_PALLAS"))
    if not use_pallas:
        return _xla_gn_silu(x, gamma, beta, scale, shift, num_groups, eps)
    if chunk == 0:
        raise ValueError(
            f"no channel chunking fits VMEM for shape {x.shape} with "
            f"group width {C // num_groups}")
    return _fused_vjp(x, gamma, beta, scale, shift, num_groups, eps,
                      chunk, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused_vjp(x, gamma, beta, scale, shift, num_groups, eps, chunk,
               interpret):
    return _pallas_gn_silu(x, gamma, beta, scale, shift, num_groups, eps,
                           chunk, interpret)


def _fused_fwd(x, gamma, beta, scale, shift, num_groups, eps, chunk,
               interpret):
    out = _pallas_gn_silu(x, gamma, beta, scale, shift, num_groups, eps,
                          chunk, interpret)
    return out, (x, gamma, beta, scale, shift)


def _fused_bwd(num_groups, eps, chunk, interpret, residuals, g):
    x, gamma, beta, scale, shift = residuals
    if scale is None:
        f = lambda xx, ga, be: _xla_gn_silu(xx, ga, be, None, None,
                                            num_groups, eps)
        _, vjp = jax.vjp(f, x, gamma, beta)
        return vjp(g) + (None, None)
    f = lambda xx, ga, be, sc, sh: _xla_gn_silu(xx, ga, be, sc, sh,
                                                num_groups, eps)
    _, vjp = jax.vjp(f, x, gamma, beta, scale, shift)
    return vjp(g)


_fused_vjp.defvjp(_fused_fwd, _fused_bwd)
