"""Context parallelism: ring attention over the device mesh.

SURVEY.md §5.7 maps the reference's (absent) long-context story to this
framework's blockwise attention: ``ops/flash_attention.py`` is the
single-chip half (online-softmax tiles, O(S·D) HBM), and this module is
the multi-chip half — **ring attention** (arXiv:2310.01889): shard the
sequence over a mesh axis, keep Q resident, and rotate K/V shards around
the ring with ``jax.lax.ppermute`` while accumulating the same online
softmax across shards. Attention over sequences N× longer than one chip's
HBM, with the K/V transfer riding ICI and overlapping the local tile
compute (XLA schedules the ppermute against the einsums).

This is the TPU-native design, not a translation: no NCCL send/recv —
one ``shard_map`` over the mesh, collectives inserted explicitly where
the math needs them (the ring rotation) and nowhere else. Each hop does
exactly the flash-forward accumulation step (same ``m``/``l``/rescale
algebra as ``ops/flash_attention.py::_flash_kernel``), so the result is
bit-comparable to single-device attention up to f32 accumulation order.

The UNet family's production shapes (S ≤ 4096) fit one chip, so nothing
in the model path dispatches here; it exists so full-image 256²
self-attention and any future long-sequence model have a running,
parity-tested multi-chip path. The single-chip half is MEASURED, not
prose (BASELINE.md round-4 long-sequence ledger): the flash kernel
executes S=65 536 full-image attention at 77 ms/apply (29% MFU) where
XLA's 64 GiB score matrix cannot exist, and beats XLA 2.1-2.2x at
S=16 384 fwd and fwd+bwd. This module's no-materialization property is
likewise pinned by XLA's own compiled memory analysis
(tests/test_cp.py::test_ring_never_materializes_score_matrix: 4.3 MiB
ring temp vs 260 MiB naive at S=4096), plus value + gradient parity vs
single-device XLA attention with K/V genuinely resident as 1/N shards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from superdiff_tpu.parallel.mesh import DATA_AXIS


def _ring_attention_local(q, k, v, axis_name: str):
    """Per-device body (runs inside ``shard_map``).

    ``q, k, v``: (B, S_local, H, D) — the local sequence shard. Rotates
    the K/V shard around ``axis_name`` N times, folding each visiting
    shard into the online-softmax state exactly like one K-block step of
    the flash kernel.
    """
    n = jax.lax.psum(1, axis_name)
    B, S, H, D = q.shape
    scale = D ** -0.5
    # heads to the front: per-hop einsums are (B,H,S,D) x (B,H,T,D)
    qh = jnp.swapaxes(q, 1, 2).astype(jnp.float32) * scale

    # ring neighbor: shard i receives from i+1 (so hop j sees shard i+j)
    perm = [((i + 1) % n, i) for i in range(n)]

    def _accumulate(k_cur, v_cur, m, l, acc):
        kh = jnp.swapaxes(k_cur, 1, 2).astype(jnp.float32)
        vh = jnp.swapaxes(v_cur, 1, 2).astype(jnp.float32)
        s = jnp.einsum("bhsd,bhtd->bhst", qh, kh)        # (B,H,S,T)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bhst,bhtd->bhsd", p, vh)
        return m_new, l, acc

    def hop(carry, _):
        # rotate FIRST, then accumulate: hop 0 (the local shard) is folded
        # out below, so the scan runs n-1 hops and the ring pays exactly
        # n-1 K/V transfers — a trailing rotate-after-last-accumulate
        # would be a dead collective XLA cannot DCE inside the scan body
        k_cur, v_cur, m, l, acc = carry
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        m, l, acc = _accumulate(k_cur, v_cur, m, l, acc)
        return (k_cur, v_cur, m, l, acc), None

    # hop 0: the resident shard, no communication
    m0 = jnp.full((B, H, S, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, H, S, 1), jnp.float32)
    acc0 = jnp.zeros((B, H, S, D), jnp.float32)
    m0, l0, acc0 = _accumulate(k, v, m0, l0, acc0)
    (_, _, _, l, acc), _ = jax.lax.scan(
        hop, (k, v, m0, l0, acc0), None, length=n - 1)
    out = acc / l
    # ring is rotation-invariant for full (non-causal) attention, so no
    # axis_index bookkeeping is needed
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)       # (B,S,H,D)


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, axis: str = DATA_AXIS) -> jnp.ndarray:
    """Multi-head attention with the sequence sharded over ``mesh[axis]``.

    ``q, k, v``: (B, S, H, D) global arrays (or already S-sharded). S must
    divide by the axis size. Returns (B, S, H, D), S-sharded the same way.
    Non-causal (the UNet's self-attention semantics,
    ``ops/attention.py::_xla_attention``).
    """
    n = mesh.shape[axis]
    if q.shape[1] % n:
        raise ValueError(f"sequence {q.shape[1]} not divisible by "
                         f"{axis}={n}")
    spec = P(None, axis, None, None)
    fn = shard_map(
        functools.partial(_ring_attention_local, axis_name=axis),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)


def shard_sequence(x: jnp.ndarray, mesh: Mesh,
                   axis: str = DATA_AXIS) -> jnp.ndarray:
    """Device-put (B, S, ...) with S sharded over ``mesh[axis]`` — the
    resident layout long-context callers keep between attention calls."""
    spec = [None] * x.ndim
    spec[1] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
