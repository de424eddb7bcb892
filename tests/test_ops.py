"""Pallas kernel parity tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from superdiff_tpu.ops.attention import _xla_attention, multihead_attention
from superdiff_tpu.ops.flash_attention import flash_attention


def _rand_qkv(rng, B=1, S=256, H=2, D=64, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (B, S, H, D), dtype=dtype)
    k = jax.random.normal(kk, (B, S, H, D), dtype=dtype)
    v = jax.random.normal(kv, (B, S, H, D), dtype=dtype)
    return q, k, v


def test_xla_attention_matches_numpy(rng):
    q, k, v = _rand_qkv(rng, S=32, D=8)
    out = _xla_attention(q, k, v)
    qn, kn, vn = map(np.asarray, (q, k, v))
    scores = np.einsum("bqhd,bkhd->bhqk", qn, kn) / np.sqrt(8)
    w = np.exp(scores - scores.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    expect = np.einsum("bhqk,bkhd->bqhd", w, vn)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)


def test_flash_matches_xla_interpret(rng):
    q, k, v = _rand_qkv(rng, S=256, D=64)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v)
    expect = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


def test_flash_multi_kblock_interpret(rng):
    """S larger than one K block exercises the online-softmax carry."""
    q, k, v = _rand_qkv(rng, S=1024, D=32)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v)
    expect = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


def test_flash_gradient_fallback(rng):
    """custom_vjp backward (XLA fallback) must match XLA attention grads."""
    q, k, v = _rand_qkv(rng, S=256, D=64)

    def loss_flash(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v) ** 2)

    g_flash = jax.grad(loss_flash)(q, k, v)
    g_xla = jax.grad(loss_xla)(q, k, v)
    np.testing.assert_allclose(np.asarray(g_flash), np.asarray(g_xla),
                               rtol=1e-3, atol=1e-3)


def test_dispatch_uses_xla_on_cpu(rng):
    """On the CPU test backend the dispatcher must take the XLA path."""
    q, k, v = _rand_qkv(rng, S=2048, D=64)
    out = multihead_attention(q, k, v)   # would crash if it tried Mosaic
    assert out.shape == q.shape
