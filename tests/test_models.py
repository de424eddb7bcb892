"""Model tests.

RefUNet is checked for fp32 numerical parity against an independent
*functional* PyTorch re-derivation of the documented math (GroupNorm eps 1e-5,
SAME 3x3 convs, additive time bias — reference semantics from
``src/models/unet.py``), executed with torch.nn.functional ops on the very
same parameter values (transposed from the Flax pytree).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superdiff_tpu.models import RefUNet, CondUNet


# ---------------------------------------------------------------- RefUNet ---

def test_ref_unet_shapes(rng):
    model = RefUNet()
    x = jnp.zeros((2, 16, 16, 1))
    t = jnp.array([0, 999])
    params = model.init(rng, x, t)
    out = model.apply(params, x, t)
    assert out.shape == (2, 16, 16, 1)


def _torch_oracle(params, x_nhwc, t):
    """Functional torch re-derivation of the RefUNet graph."""
    import torch
    import torch.nn.functional as F

    p = jax.tree_util.tree_map(lambda a: torch.tensor(np.asarray(a)),
                               params["params"])
    x = torch.tensor(np.asarray(x_nhwc)).permute(0, 3, 1, 2)  # NCHW

    # sinusoidal embedding (dim 256)
    half = 128
    freqs = torch.exp(torch.arange(half, dtype=torch.float32)
                      * -(math.log(10000.0) / (half - 1)))
    args = torch.tensor(np.asarray(t), dtype=torch.float32)[:, None] * freqs
    emb = torch.cat([torch.sin(args), torch.cos(args)], dim=-1)

    mlp = p["time_mlp"]
    emb = emb @ mlp["dense_0"]["kernel"] + mlp["dense_0"]["bias"]
    emb = F.silu(emb)
    emb = emb @ mlp["dense_1"]["kernel"] + mlp["dense_1"]["bias"]

    def block(bp, h, out_ch):
        in_ch = h.shape[1]
        h = F.group_norm(h, min(4, in_ch), bp["norm_0"]["scale"],
                         bp["norm_0"]["bias"], eps=1e-5)
        h = F.silu(h)
        w = bp["conv_0"]["kernel"].permute(3, 2, 0, 1)
        h = F.conv2d(h, w, bp["conv_0"]["bias"], padding=1)
        h = F.group_norm(h, min(4, out_ch), bp["norm_1"]["scale"],
                         bp["norm_1"]["bias"], eps=1e-5)
        h = F.silu(h)
        w = bp["conv_1"]["kernel"].permute(3, 2, 0, 1)
        h = F.conv2d(h, w, bp["conv_1"]["bias"], padding=1)
        bias = emb @ bp["time_emb"]["kernel"] + bp["time_emb"]["bias"]
        return h + bias[:, :, None, None]

    h = block(p["down_0"], x, 64)
    h = block(p["down_1"], h, 128)
    h = block(p["mid"], h, 128)
    h = block(p["up_0"], h, 64)
    h = block(p["up_1"], h, 1)
    return h.permute(0, 2, 3, 1).numpy()  # back to NHWC


def test_ref_unet_torch_parity(rng):
    model = RefUNet()
    x = jax.random.normal(rng, (2, 16, 16, 1))
    t = jnp.array([17, 512])
    params = model.init(jax.random.PRNGKey(3), x, t)
    ours = np.asarray(model.apply(params, x, t))
    oracle = _torch_oracle(params, x, t)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------- CondUNet ---

def _tiny_cond_unet(**kw):
    cfg = dict(base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
               attn_resolutions=(8,), num_heads=2, num_classes=2,
               time_emb_dim=16, groups=4)
    cfg.update(kw)
    return CondUNet(**cfg)


def test_cond_unet_shapes_and_finite(rng):
    model = _tiny_cond_unet()
    x = jnp.zeros((2, 16, 16, 1))
    t = jnp.array([0, 999])
    y = jnp.array([0, 1])
    params = model.init(rng, x, t, y)
    out = model.apply(params, x, t, y)
    assert out.shape == (2, 16, 16, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_cond_unet_zero_init_output(rng):
    """Final conv is zero-init: output must be exactly 0 at init."""
    model = _tiny_cond_unet()
    x = jax.random.normal(rng, (1, 16, 16, 1))
    t = jnp.array([5])
    y = jnp.array([1])
    params = model.init(jax.random.PRNGKey(1), x, t, y)
    out = model.apply(params, x, t, y)
    assert float(jnp.abs(out).max()) == 0.0


def test_cond_unet_label_sensitivity(rng):
    model = _tiny_cond_unet()
    x = jax.random.normal(rng, (1, 16, 16, 1))
    t = jnp.array([100])
    params = model.init(jax.random.PRNGKey(2), x, t, jnp.array([0]))
    # perturb the zero-init out conv so label differences can reach the output
    params = jax.tree_util.tree_map(
        lambda a: a + 0.01 if a.ndim == 4 else a, params)
    o0 = model.apply(params, x, t, jnp.array([0]))
    o1 = model.apply(params, x, t, jnp.array([1]))
    onull = model.apply(params, x, t, jnp.array([model.null_label]))
    assert float(jnp.abs(o0 - o1).max()) > 0
    assert float(jnp.abs(o0 - onull).max()) > 0


def test_cond_unet_unconditional_variant(rng):
    model = _tiny_cond_unet(num_classes=0)
    x = jnp.zeros((1, 16, 16, 1))
    t = jnp.array([1])
    params = model.init(rng, x, t)
    out = model.apply(params, x, t)
    assert out.shape == x.shape


def test_cond_unet_requires_label_when_conditional(rng):
    model = _tiny_cond_unet()
    x = jnp.zeros((1, 16, 16, 1))
    t = jnp.array([1])
    with pytest.raises(ValueError):
        model.init(rng, x, t)


def test_cond_unet_bf16_compute(rng):
    model = _tiny_cond_unet(compute_dtype=jnp.bfloat16)
    x = jnp.zeros((1, 16, 16, 1), dtype=jnp.float32)
    t = jnp.array([1])
    y = jnp.array([0])
    params = model.init(rng, x, t, y)
    out = model.apply(params, x, t, y)
    # output head runs fp32
    assert out.dtype == jnp.float32
    # params stay fp32
    leaves = jax.tree_util.tree_leaves(params)
    assert all(l.dtype == jnp.float32 for l in leaves)


def test_space_to_depth_roundtrip(rng):
    from superdiff_tpu.models.unet import space_to_depth, depth_to_space

    x = jax.random.normal(rng, (2, 16, 16, 3))
    for p in (2, 4):
        y = space_to_depth(x, p)
        assert y.shape == (2, 16 // p, 16 // p, 3 * p * p)
        np.testing.assert_array_equal(np.asarray(depth_to_space(y, p)),
                                      np.asarray(x))
    with pytest.raises(ValueError):
        space_to_depth(jnp.zeros((1, 15, 15, 1)), 2)


def test_cond_unet_pixel_shuffle_stem(rng):
    """eff256-style variant: space-to-depth stem, image-space I/O intact."""
    model = _tiny_cond_unet(pixel_shuffle=2, attn_resolutions=(4,))
    x = jax.random.normal(rng, (2, 16, 16, 1))
    t = jnp.array([0, 999])
    y = jnp.array([0, 1])
    params = model.init(jax.random.PRNGKey(6), x, t, y)
    out = model.apply(params, x, t, y)
    assert out.shape == (2, 16, 16, 1)
    assert np.isfinite(np.asarray(out)).all()
    # zero-init head still holds through the depth-to-space inverse
    assert float(jnp.abs(out).max()) == 0.0


def test_eff256_preset_builds():
    from superdiff_tpu.models.presets import build_model

    m = build_model("eff256", num_classes=2)
    assert m.pixel_shuffle == 2
    assert m.channel_mults == (1, 2, 2, 4, 4)


def test_cond_unet_grads_flow(rng):
    model = _tiny_cond_unet()
    x = jax.random.normal(rng, (2, 16, 16, 1))
    t = jnp.array([3, 7])
    y = jnp.array([0, 1])
    params = model.init(jax.random.PRNGKey(4), x, t, y)
    # Perturb away the zero-init heads (ResBlock conv_1 / out_conv): at
    # exact init they make upstream grads legitimately zero, which is not
    # what this test is about.
    keys = jax.random.split(jax.random.PRNGKey(5),
                            len(jax.tree_util.tree_leaves(params)))
    params = jax.tree_util.tree_map(
        lambda a, k: a + 0.01 * jax.random.normal(k, a.shape, a.dtype),
        params,
        jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(params), list(keys)))

    def loss(p):
        return jnp.mean((model.apply(p, x, t, y) + x) ** 2)

    g = jax.grad(loss)(params)
    norms = [float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g)]
    assert np.isfinite(norms).all()
    assert sum(n > 0 for n in norms) > len(norms) // 2


def test_fast256_preset_builds_and_runs(rng):
    from superdiff_tpu.models.presets import build_model

    m = build_model("fast256", num_classes=2, base_channels=8,
                    attn_resolutions=(4,))
    assert m.pixel_shuffle == 4
    x = jnp.zeros((1, 32, 32, 1))
    t = jnp.array([1]); y = jnp.array([0])
    params = m.init(rng, x, t, y)
    out = m.apply(params, x, t, y)
    assert out.shape == (1, 32, 32, 1)


def test_attn256_preset_builds():
    """attn256 = eff256 topology + 32² attention (S=1024 — the level the
    Pallas flash kernel carries by default, BASELINE.md A/B table)."""
    from superdiff_tpu.models.presets import build_model

    m = build_model("attn256", num_classes=2)
    assert m.pixel_shuffle == 2
    assert m.attn_resolutions == (32, 16)
    assert m.channel_mults == (1, 2, 2, 4, 4)


def test_attn256d_down_only_attention(rng):
    """attn256d keeps the 32² attention in the down path + mid but not the
    up path (flagship-unification candidate, VERDICT r2 #2): the up path
    must carry 16²-level attention only."""
    import jax.numpy as jnp

    from superdiff_tpu.models.presets import build_model

    m = build_model("attn256d", num_classes=2, compute_dtype=jnp.float32)
    assert m.up_attn_resolutions == (16,)
    # 64² input (shuffle 2 -> top level 32²) puts 32² at level 0
    x = jnp.zeros((1, 64, 64, 1))
    t = jnp.zeros((1,), jnp.int32)
    y = jnp.zeros((1,), jnp.int32)
    p = m.init(rng, x, t, y)
    names = {n for n in p["params"] if "attn" in n}
    assert "down_0_attn_0" in names          # 32² down attention present
    assert "up_1_attn_0" in names            # 16² up attention present
    assert not any(n.startswith("up_0_attn") for n in names), names
    out = m.apply(p, x, t, y)
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())


def test_cond_unet_per_level_res_blocks(rng):
    """``num_res_blocks`` accepts a per-level tuple: level i gets exactly
    blocks[i] down ResBlocks and blocks[i]+1 up ResBlocks, an int stays
    uniform, and a wrong-length tuple is rejected. The tuple form exists to
    slim the dominant top level (BASELINE.md round-3 profile: 52% of the
    flagship step is norm traffic at >=128² shapes) without touching the
    cheap deep levels."""
    m = _tiny_cond_unet(channel_mults=(1, 2, 2), num_res_blocks=(1, 2, 1),
                        attn_resolutions=())
    x = jnp.zeros((1, 16, 16, 1))
    t = jnp.array([3])
    y = jnp.array([1])
    p = m.init(rng, x, t, y)
    names = set(p["params"])
    # down path: blocks[i] per level
    assert "down_0_block_0" in names and "down_0_block_1" not in names
    assert "down_1_block_1" in names and "down_1_block_2" not in names
    assert "down_2_block_0" in names and "down_2_block_1" not in names
    # up path: blocks[i] + 1 per level
    assert "up_0_block_1" in names and "up_0_block_2" not in names
    assert "up_1_block_2" in names and "up_1_block_3" not in names
    assert "up_2_block_1" in names and "up_2_block_2" not in names
    out = m.apply(p, x, t, y)
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())

    # int form is the same model as the all-equal tuple
    mi = _tiny_cond_unet(channel_mults=(1, 2), num_res_blocks=2,
                         attn_resolutions=())
    mt = _tiny_cond_unet(channel_mults=(1, 2), num_res_blocks=(2, 2),
                         attn_resolutions=())
    pi = mi.init(jax.random.PRNGKey(7), x, t, y)
    pt = mt.init(jax.random.PRNGKey(7), x, t, y)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: bool((a == b).all()), pi, pt))

    bad = _tiny_cond_unet(channel_mults=(1, 2), num_res_blocks=(1, 2, 1),
                          attn_resolutions=())
    with pytest.raises(ValueError, match="num_res_blocks"):
        bad.init(rng, x, t, y)


def test_fastattn256_preset(rng):
    """fastattn256 = fast256's 4x-shuffle topology + attn256d's attention
    policy (32² attention down+mid, 16² both paths)."""
    import jax.numpy as jnp

    from superdiff_tpu.models.presets import build_model

    m = build_model("fastattn256", num_classes=2, compute_dtype=jnp.float32)
    assert m.pixel_shuffle == 4 and m.up_attn_resolutions == (16,)
    # 128² input (shuffle 4 -> top level 32²) puts 32² at level 0
    x = jnp.zeros((1, 128, 128, 1))
    t = jnp.zeros((1,), jnp.int32)
    y = jnp.zeros((1,), jnp.int32)
    p = m.init(rng, x, t, y)
    names = {n for n in p["params"] if "attn" in n}
    assert "down_0_attn_0" in names          # 32² down attention present
    assert "up_1_attn_0" in names            # 16² up attention present
    assert not any(n.startswith("up_0_attn") for n in names), names
    out = m.apply(p, x, t, y)
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())


def test_all_presets_build():
    """Every named preset constructs, and per-level block tuples always
    match their channel_mults length (slim256/attn256s carry tuples)."""
    from superdiff_tpu.models.presets import _PRESETS, build_model

    for name, cfg in _PRESETS.items():
        m = build_model(name, num_classes=2)
        nrb = m.num_res_blocks
        if not isinstance(nrb, int):
            assert len(nrb) == len(m.channel_mults), name
    # the slim speed/quality middle point keeps the flagship's attention
    m = build_model("slim256", num_classes=2)
    assert m.num_res_blocks == (1, 1, 2, 2, 2)
    assert tuple(m.attn_resolutions) == (32, 16)
    assert tuple(m.up_attn_resolutions) == (16,)


def test_cond_unet_remat_parity(rng):
    """remat=True must not change the function: identical param structure,
    identical forward output, and grads matching the unremat model (remat
    recomputes the same ops in the bwd pass — values agree to fp noise)."""
    model = _tiny_cond_unet()
    model_r = _tiny_cond_unet(remat=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 1)),
                    jnp.float32)
    t = jnp.array([3, 77])
    y = jnp.array([0, 1])
    params = model.init(rng, x, t, y)
    params_r = model_r.init(rng, x, t, y)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_r))

    out = model.apply(params, x, t, y)
    out_r = model_r.apply(params, x, t, y)   # same params on the remat graph
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                               rtol=1e-6, atol=1e-7)

    def loss(p, m):
        return jnp.mean(jnp.square(m.apply(p, x, t, y)))

    g = jax.grad(loss)(params, model)
    g_r = jax.grad(loss)(params, model_r)
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-6)


def test_wide256_preset(rng):
    """wide256 (round-4 width-at-128² experiment, VERDICT r3 #2): C=128 at
    the 128² level (lane-full (8,128) norm tiles), one ResBlock there,
    flagship attention policy, ~38.6 M params — within ~3% of attn256d's
    37.5 M so throughput deltas are width effects, not capacity."""
    import jax

    from superdiff_tpu.models.presets import build_model

    m = build_model("wide256", num_classes=2, compute_dtype=jnp.float32)
    assert m.base_channels == 128
    assert m.channel_mults == (1, 1, 1, 2, 2)
    assert m.num_res_blocks == (1, 2, 2, 2, 2)
    assert m.pixel_shuffle == 2
    assert m.attn_resolutions == (32, 16)
    assert m.up_attn_resolutions == (16,)

    # param budget vs the flagship, by abstract trace (no compile)
    x = jnp.zeros((1, 256, 256, 1))
    t = jnp.zeros((1,), jnp.int32)
    y = jnp.zeros((1,), jnp.int32)
    n = {}
    for name in ("wide256", "attn256d"):
        mod = build_model(name, num_classes=2)
        shapes = jax.eval_shape(lambda r: mod.init(r, x, t, y), rng)
        n[name] = sum(int(np.prod(s.shape))
                      for s in jax.tree_util.tree_leaves(shapes))
    assert abs(n["wide256"] - n["attn256d"]) / n["attn256d"] < 0.05

    # functional forward at a reduced spatial size (32² top level after
    # shuffle puts the down-path attention at level 0, as at 256²)
    xs = jnp.zeros((1, 64, 64, 1))
    p = m.init(rng, xs, t, y)
    out = m.apply(p, xs, t, y)
    assert out.shape == xs.shape and bool(jnp.isfinite(out).all())
