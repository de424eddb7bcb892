"""Pallas kernel parity tests (interpreter mode on CPU)."""

import os

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


@pytest.mark.parametrize("S,D", [(256, 64), (1024, 32)])
def test_flash_pallas_backward_parity(rng, monkeypatch, S, D):
    """The Pallas backward kernels (dq + dk/dv, recomputation from lse)
    must match XLA attention grads — incl. the multi-block case (S=1024:
    4 Q blocks x 2 K blocks) where the accumulator carries span the grid.
    """
    monkeypatch.setenv("SUPERDIFF_TPU_FLASH_BWD", "pallas")
    q, k, v = _rand_qkv(rng, S=S, D=D)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"d{name} mismatch")


def test_flash_forward_lse(rng):
    """The forward's logsumexp residual must equal the true row-wise
    logsumexp of the scaled score matrix (backward recomputes p from it)."""
    from superdiff_tpu.ops.flash_attention import _flash_forward, _to_bh

    q, k, v = _rand_qkv(rng, S=512, D=32)
    with pltpu.force_tpu_interpret_mode():
        out, lse = _flash_forward(q, k, v)
    assert lse.shape == (2, 512, 1)     # (BH, S, 1) Mosaic-tileable layout
    qb, kb = np.asarray(_to_bh(q)), np.asarray(_to_bh(k))
    scores = np.einsum("bqd,bkd->bqk", qb, kb) / np.sqrt(32)
    m = scores.max(-1)
    expect = m + np.log(np.exp(scores - m[..., None]).sum(-1))
    np.testing.assert_allclose(np.asarray(lse)[..., 0], expect,
                               rtol=1e-5, atol=1e-5)


def test_dispatch_uses_xla_on_cpu(rng):
    """On the CPU test backend the dispatcher must take the XLA path."""
    q, k, v = _rand_qkv(rng, S=2048, D=64)
    out = multihead_attention(q, k, v)   # would crash if it tried Mosaic
    assert out.shape == q.shape


# --------------------------------------------- fused GroupNorm+FiLM+SiLU ---

from superdiff_tpu.ops.fused_norm import (  # noqa: E402
    _xla_gn_silu, fused_groupnorm_silu)


def _gn_inputs(rng, B=2, H=16, W=16, C=32, dtype=jnp.float32):
    ks = jax.random.split(rng, 5)
    x = jax.random.normal(ks[0], (B, H, W, C), dtype=dtype)
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (C,))
    beta = 0.1 * jax.random.normal(ks[2], (C,))
    scale = 0.2 * jax.random.normal(ks[3], (B, C))
    shift = 0.2 * jax.random.normal(ks[4], (B, C))
    return x, gamma, beta, scale, shift


def _numpy_gn_silu(x, gamma, beta, scale, shift, G, eps=1e-5):
    x = np.asarray(x, np.float32)
    B, H, W, C = x.shape
    xg = x.reshape(B, H * W, G, C // G)
    m = xg.mean(axis=(1, 3), keepdims=True)
    v = xg.var(axis=(1, 3), keepdims=True)
    y = ((xg - m) / np.sqrt(v + eps)).reshape(B, H, W, C)
    y = y * np.asarray(gamma) + np.asarray(beta)
    if scale is not None:
        y = y * (1 + np.asarray(scale)[:, None, None, :]) \
            + np.asarray(shift)[:, None, None, :]
    return y / (1 + np.exp(-y))


def test_xla_gn_silu_matches_numpy(rng):
    x, gamma, beta, scale, shift = _gn_inputs(rng)
    got = _xla_gn_silu(x, gamma, beta, scale, shift, 8, 1e-5)
    expect = _numpy_gn_silu(x, gamma, beta, scale, shift, 8)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("G,C,film", [(8, 32, True), (8, 32, False),
                                      (16, 48, True)])
def test_fused_gn_silu_pallas_parity(rng, G, C, film):
    """Pallas kernel (interpreter) vs XLA reference, incl. non-pow2 group
    width (C=48, G=16 -> width 3, from up-path skip concats)."""
    x, gamma, beta, scale, shift = _gn_inputs(rng, C=C)
    if not film:
        scale = shift = None
    got = fused_groupnorm_silu(x, gamma, beta, G, scale, shift,
                               force="pallas", interpret=True)
    expect = _xla_gn_silu(x, gamma, beta, scale, shift, G, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-4, atol=1e-5)


def test_fused_gn_silu_chunked_channels(rng):
    """Force multi-chunk grids: a tight budget drops the chunk to a
    lane-aligned (128) divisor below C."""
    import superdiff_tpu.ops.fused_norm as fn

    x, gamma, beta, scale, shift = _gn_inputs(rng, B=1, H=8, W=8, C=256)
    assert fn._chunk_channels(256, 64, 64, 4) == 256
    old = fn._BLOCK_BUDGET
    fn._BLOCK_BUDGET = 8 * 8 * 128 * 4   # chunk of 128 channels max
    try:
        assert fn._chunk_channels(256, 64, 64, 4) == 128
        got = fused_groupnorm_silu(x, gamma, beta, 4, scale, shift,
                                   force="pallas", interpret=True)
    finally:
        fn._BLOCK_BUDGET = old
    expect = _xla_gn_silu(x, gamma, beta, scale, shift, 4, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-4, atol=1e-5)


def test_chunk_rule_mosaic_alignment():
    """Chunks below C must be 128-divisible (Mosaic trailing-dim tiling);
    ineligible shapes report 0 -> XLA fallback."""
    from superdiff_tpu.ops.fused_norm import _chunk_channels, _BLOCK_BUDGET

    # C=192 (up-path concat), gw=6, HW=16384, bf16: full C doesn't fit the
    # budget and no 128-divisible divisor of 192 exists -> 0.
    assert _chunk_channels(192, 6, 16384, 2) == 0
    # C=64, HW=16384, bf16 = 2 MB: exactly at budget -> whole C.
    assert _BLOCK_BUDGET >= 16384 * 64 * 2
    assert _chunk_channels(64, 2, 16384, 2) == 64


def test_fused_gn_silu_bf16(rng):
    x, gamma, beta, scale, shift = _gn_inputs(rng, dtype=jnp.bfloat16)
    got = fused_groupnorm_silu(x, gamma, beta, 8, scale, shift,
                               force="pallas", interpret=True)
    assert got.dtype == jnp.bfloat16
    expect = _xla_gn_silu(x, gamma, beta, scale, shift, 8, 1e-5)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(expect, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_fused_gn_silu_grad_fallback(rng):
    x, gamma, beta, scale, shift = _gn_inputs(rng, H=8, W=8)

    def loss_pallas(x, gamma, beta, scale, shift):
        return jnp.sum(fused_groupnorm_silu(
            x, gamma, beta, 8, scale, shift,
            force="pallas", interpret=True) ** 2)

    def loss_xla(x, gamma, beta, scale, shift):
        return jnp.sum(_xla_gn_silu(x, gamma, beta, scale, shift,
                                    8, 1e-5) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(
        x, gamma, beta, scale, shift)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(
        x, gamma, beta, scale, shift)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_fused_gn_silu_dispatch_cpu(rng):
    """Auto dispatch on CPU takes the XLA path (no Mosaic crash)."""
    x, gamma, beta, scale, shift = _gn_inputs(rng)
    out = fused_groupnorm_silu(x, gamma, beta, 8, scale, shift)
    assert out.shape == x.shape


def test_fused_gn_silu_validation(rng):
    x, gamma, beta, scale, shift = _gn_inputs(rng)
    with pytest.raises(ValueError):
        fused_groupnorm_silu(x, gamma, beta, 7)        # C % G != 0
    with pytest.raises(ValueError):
        fused_groupnorm_silu(x, gamma, beta, 8, scale, None)


def test_host_init_disables_pallas_during_cpu_trace(rng, monkeypatch):
    """host_init traces model.init on the host CPU backend; the attention
    dispatch consults the GLOBAL default backend, so on a real TPU session
    it would try to lower the Pallas kernel for CPU and fail (regression:
    ValueError 'Only interpret mode is supported on CPU backend')."""
    import jax

    from superdiff_tpu.models import CondUNet
    from superdiff_tpu.utils.env import host_init

    # pretend the session default backend is TPU (as under the driver)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("SUPERDIFF_TPU_FLASH_MIN_S", "64")

    model = CondUNet(base_channels=8, channel_mults=(1, 2),
                     num_res_blocks=1, attn_resolutions=(8,), num_heads=2,
                     num_classes=2, time_emb_dim=16, groups=4)
    x = jnp.zeros((2, 16, 16, 1))
    t = jnp.zeros((2,), dtype=jnp.int32)
    y = jnp.zeros((2,), dtype=jnp.int32)
    params = host_init(model.init, rng, x, t, y)
    assert params is not None
    # and the env var did not leak
    assert os.environ.get("SUPERDIFF_TPU_DISABLE_PALLAS") is None


def test_flash_block_env_knobs(rng, monkeypatch):
    """SUPERDIFF_TPU_FLASH_BQ/BK reshape the grid without changing values
    (and are clamped to divisors of S)."""
    q, k, v = _rand_qkv(rng, S=256, D=64)
    with pltpu.force_tpu_interpret_mode():
        base = flash_attention(q, k, v)
        monkeypatch.setenv("SUPERDIFF_TPU_FLASH_BQ", "64")
        monkeypatch.setenv("SUPERDIFF_TPU_FLASH_BK", "192")  # non-divisor: halved until it divides S
        got = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------- lane-packed GN chain ---

def test_packed_norm_matches_unpacked_math(rng):
    """groupnorm_film_silu with the W-fold engaged must equal the plain
    chain bit-for-bit in f32 (folding only permutes elements *within* each
    (batch, group) reduction set)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from superdiff_tpu.ops.packed_norm import groupnorm_film_silu, _fold_factor

    B, H, W, C, G = 2, 8, 8, 64, 32
    assert _fold_factor(W, C) == 2
    x = jax.random.normal(rng, (B, H, W, C), jnp.float32)
    gamma = jax.random.normal(jax.random.fold_in(rng, 1), (C,)) * 0.1 + 1.0
    beta = jax.random.normal(jax.random.fold_in(rng, 2), (C,)) * 0.1
    fs = jax.random.normal(jax.random.fold_in(rng, 3), (B, C)) * 0.1
    ft = jax.random.normal(jax.random.fold_in(rng, 4), (B, C)) * 0.1

    a = groupnorm_film_silu(x, gamma, beta, G, film_scale=fs, film_shift=ft,
                            pack=False)
    b = groupnorm_film_silu(x, gamma, beta, G, film_scale=fs, film_shift=ft,
                            pack=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


def test_packed_norm_matches_flax_groupnorm(rng):
    """The collapsed-affine chain must reproduce
    nn.GroupNorm -> FiLM -> silu (the ResBlock prologue it replaces)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn
    from superdiff_tpu.ops.packed_norm import groupnorm_film_silu

    B, H, W, C, G = 2, 4, 6, 32, 8
    x = jax.random.normal(rng, (B, H, W, C), jnp.float32)
    gn = nn.GroupNorm(num_groups=G, epsilon=1e-5)
    params = gn.init(jax.random.fold_in(rng, 9), x)
    gamma = params["params"]["scale"] + 0.3
    beta = params["params"]["bias"] - 0.1
    params = {"params": {"scale": gamma, "bias": beta}}
    fs = jax.random.normal(jax.random.fold_in(rng, 3), (B, C)) * 0.2
    ft = jax.random.normal(jax.random.fold_in(rng, 4), (B, C)) * 0.2

    ref = gn.apply(params, x)
    ref = ref * (1.0 + fs[:, None, None, :]) + ft[:, None, None, :]
    ref = nn.silu(ref)
    got = groupnorm_film_silu(x, gamma, beta, G, film_scale=fs,
                              film_shift=ft, pack=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_normact_module_matches_groupnorm_chain(rng):
    """The standalone :class:`NormAct` module (lane-packed chain; the
    production model path carries no dispatch to it after the on-chip e2e
    A/B — BASELINE.md) must match the plain GroupNorm->FiLM->SiLU chain in
    value AND gradient, with the ``nn.GroupNorm`` param layout
    (``scale``/``bias``) so checkpoints stay interchangeable."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import flax.linen as nn
    from superdiff_tpu.models.layers import NormAct

    B, H, W, C, G = 2, 8, 16, 32, 8   # C<128, W even -> fold engages
    x = jax.random.normal(rng, (B, H, W, C), jnp.float32)
    scale = 0.1 * jax.random.normal(jax.random.fold_in(rng, 1), (B, C))
    shift = 0.1 * jax.random.normal(jax.random.fold_in(rng, 2), (B, C))

    packed = NormAct(num_groups=G)
    params = packed.init(jax.random.fold_in(rng, 3), x, scale, shift)
    plain = nn.GroupNorm(num_groups=G, epsilon=1e-5)
    # identical param layout: NormAct params load into nn.GroupNorm as-is
    ref_params = {"params": {"scale": params["params"]["scale"],
                             "bias": params["params"]["bias"]}}

    def f_packed(xx):
        return packed.apply(params, xx, scale, shift).sum()

    def f_plain(xx):
        h = plain.apply(ref_params, xx)
        h = h * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]
        return nn.silu(h).sum()

    expected = nn.silu(plain.apply(ref_params, x)
                       * (1.0 + scale[:, None, None, :])
                       + shift[:, None, None, :])
    np.testing.assert_allclose(
        np.asarray(packed.apply(params, x, scale, shift)),
        np.asarray(expected), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(jax.grad(f_packed)(x)),
                               np.asarray(jax.grad(f_plain)(x)),
                               rtol=2e-4, atol=2e-5)


def test_packed_norm_finite_on_near_constant_input(rng):
    """Single-pass E[x^2]-E[x]^2 can go negative past eps on near-constant
    large-magnitude activations (catastrophic cancellation in f32); the
    clamp must keep the packed path finite exactly like flax GroupNorm."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from superdiff_tpu.ops.packed_norm import groupnorm_film_silu

    B, H, W, C, G = 1, 8, 8, 64, 32
    x = 600.0 + 1e-3 * jax.random.normal(rng, (B, H, W, C), jnp.float32)
    gamma = jnp.ones((C,))
    beta = jnp.zeros((C,))
    for pack in (False, True):
        y = groupnorm_film_silu(x, gamma, beta, G, pack=pack)
        assert np.isfinite(np.asarray(y)).all(), f"pack={pack}"


def test_host_init_disk_cache(rng, tmp_path, monkeypatch):
    """host_init(cache_key=...) persists the realized pytree and serves it
    back value-identical; a structurally different init under the same key
    is detected by the eval_shape validation and re-initialized (stale
    caches can never leak into a changed model)."""
    import numpy as np

    from superdiff_tpu.models import CondUNet
    from superdiff_tpu.utils.env import host_init

    monkeypatch.setenv("SUPERDIFF_TPU_CACHE_DIR", str(tmp_path))

    model = CondUNet(base_channels=8, channel_mults=(1, 2),
                     num_res_blocks=1, attn_resolutions=(), num_classes=2,
                     time_emb_dim=16, groups=4)
    x = jnp.zeros((2, 16, 16, 1))
    t = jnp.zeros((2,), dtype=jnp.int32)
    y = jnp.zeros((2,), dtype=jnp.int32)

    p1 = host_init(model.init, rng, x, t, y, cache_key="k")
    # the on-disk key folds in a content digest of the init args
    # (ADVICE r4: same cache_key + different PRNG seed must miss)
    entries = list((tmp_path / "params").glob("k-*.pkl"))
    assert len(entries) == 1, entries
    p2 = host_init(model.init, rng, x, t, y, cache_key="k")
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # same key, different seed -> value-level miss (a second entry), not
    # a stale hit of the first seed's values
    rng2 = jax.random.PRNGKey(1234)
    p2b = host_init(model.init, rng2, x, t, y, cache_key="k")
    assert len(list((tmp_path / "params").glob("k-*.pkl"))) == 2
    l1 = jax.tree_util.tree_leaves(p1)
    l2b = jax.tree_util.tree_leaves(p2b)
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(l1, l2b))

    # same key, different architecture -> must NOT serve the stale entry
    wider = CondUNet(base_channels=16, channel_mults=(1, 2),
                     num_res_blocks=1, attn_resolutions=(), num_classes=2,
                     time_emb_dim=16, groups=4)
    p3 = host_init(wider.init, rng, x, t, y, cache_key="k")
    n1 = sum(a.size for a in jax.tree_util.tree_leaves(p1))
    n3 = sum(a.size for a in jax.tree_util.tree_leaves(p3))
    assert n3 > n1
