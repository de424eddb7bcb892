"""Sharded training-engine tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superdiff_tpu.diffusion import make_schedule
from superdiff_tpu.models import CondUNet, RefUNet
from superdiff_tpu.parallel import make_mesh, shard_batch
from superdiff_tpu.training import create_train_state, make_train_step, \
    make_eval_step
from superdiff_tpu.training.state import make_optimizer, ema_update
from superdiff_tpu.data import synthetic_xray_batch

RES = 16
B = 8


@pytest.fixture(scope="module")
def schedule():
    return make_schedule(100)


def _tiny_model():
    return CondUNet(base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
                    attn_resolutions=(), num_classes=2, time_emb_dim=16,
                    groups=4)


def _batch(conditional=True, seed=0):
    imgs, labels = synthetic_xray_batch(B, RES, seed=seed)
    out = {"image": jnp.asarray(imgs)}
    if conditional:
        out["label"] = jnp.asarray(labels)
    return out


def _make_state(model, conditional=True, **opt_kw):
    x = jnp.zeros((B, RES, RES, 1))
    t = jnp.zeros((B,), dtype=jnp.int32)
    args = (x, t, jnp.zeros((B,), dtype=jnp.int32)) if conditional else (x, t)
    return create_train_state(model, jax.random.PRNGKey(0), args,
                              tx=make_optimizer(**opt_kw))


def test_train_step_decreases_loss_overfit(schedule):
    """Overfit a tiny model on one batch: loss must drop substantially."""
    model = _tiny_model()
    state = _make_state(model, learning_rate=2e-3)
    step = make_train_step(schedule, conditional=True)
    batch = _batch()
    first = None
    losses = []
    for i in range(80):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert last < first * 0.75, (first, last)
    assert int(state.step) == 80


def test_train_step_sharded_matches_unsharded(schedule, devices8):
    """The mesh-sharded step must produce the same numbers as single-device
    (same params, same batch, same RNG)."""
    model = _tiny_model()
    mesh = make_mesh(8)
    batch = _batch()

    state_a = _make_state(model)
    step_a = make_train_step(schedule, conditional=True)
    state_a, m_a = step_a(state_a, batch)

    state_b = _make_state(model)
    step_b = make_train_step(schedule, mesh=mesh, conditional=True)
    sharded = shard_batch(batch, mesh)
    state_b, m_b = step_b(state_b, sharded)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_sharded_batch_is_actually_distributed(devices8):
    mesh = make_mesh(8)
    batch = shard_batch(_batch(), mesh)
    img = batch["image"]
    assert len(img.sharding.device_set) == 8
    # each device holds 1/8 of the batch
    shard = img.addressable_shards[0]
    assert shard.data.shape[0] == B // 8


def test_ema_warmup_then_decay():
    p0 = {"w": jnp.zeros(3)}
    p1 = {"w": jnp.ones(3)}
    early = ema_update(p0, p1, 0.995, jnp.asarray(0))
    # step 0: eff = min(.995, 1/10) = 0.1 -> ema ~= 0.9 * new
    np.testing.assert_allclose(np.asarray(early["w"]), 0.9, rtol=1e-6)
    late = ema_update(p0, p1, 0.995, jnp.asarray(10_000))
    np.testing.assert_allclose(np.asarray(late["w"]), 0.005, rtol=1e-4)


def test_cfg_label_dropout_trains(schedule):
    model = _tiny_model()
    state = _make_state(model)
    step = make_train_step(schedule, conditional=True, cfg_drop_prob=0.5,
                           null_label=model.null_label)
    state, metrics = step(state, _batch())
    assert np.isfinite(float(metrics["loss"]))


def test_unconditional_ref_unet_trains(schedule):
    model = RefUNet(base_channels=8, time_emb_dim=32)
    x = jnp.zeros((B, RES, RES, 1))
    t = jnp.zeros((B,), dtype=jnp.int32)
    state = create_train_state(model, jax.random.PRNGKey(0), (x, t))
    step = make_train_step(schedule, conditional=False)
    state, metrics = step(state, _batch(conditional=False))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))


def test_eval_step_uses_ema(schedule):
    model = _tiny_model()
    state = _make_state(model)
    eval_step = make_eval_step(schedule, conditional=True)
    l1 = float(eval_step(state, _batch()))
    # corrupt raw params; EMA untouched -> eval loss must not change
    state2 = state.replace(params=jax.tree_util.tree_map(
        lambda a: a + 100.0, state.params))
    l2 = float(eval_step(state2, _batch()))
    assert l1 == l2


def test_optimizer_options():
    tx = make_optimizer(weight_decay=0.01, grad_clip_norm=1.0,
                        schedule="cosine", total_steps=100, warmup_steps=10)
    params = {"w": jnp.ones(4)}
    st = tx.init(params)
    upd, _ = tx.update({"w": jnp.ones(4)}, st, params)
    assert np.isfinite(np.asarray(upd["w"])).all()
    with pytest.raises(ValueError):
        make_optimizer(schedule="cosine")  # missing total_steps
    with pytest.raises(ValueError):
        make_optimizer(schedule="poly")


def test_grad_reduction_across_devices(schedule, devices8):
    """Different per-device shards must still yield one consistent update
    (i.e. gradients are reduced, not per-device)."""
    model = _tiny_model()
    mesh = make_mesh(8)
    step = make_train_step(schedule, mesh=mesh, conditional=True)
    state = _make_state(model)
    state, _ = step(state, shard_batch(_batch(seed=3), mesh))
    # params remain fully replicated after the update
    p = jax.tree_util.tree_leaves(state.params)[0]
    assert len(p.sharding.device_set) == 8
    vals = [np.asarray(s.data) for s in p.addressable_shards]
    for v in vals[1:]:
        np.testing.assert_array_equal(vals[0], v)




def test_bf16_norm_training_step(schedule):
    """``model.norm_dtype=bfloat16`` (config knob, scripts/bench_r3_train.py
    A/B): the train step runs, params/EMA stay f32, and grads agree with
    the f32-norm step to bf16 tolerance on the same batch."""
    from superdiff_tpu.config import Config
    from superdiff_tpu.models.presets import model_from_config

    cfg = Config()
    cfg.model.preset = "small64"
    cfg.model.base_channels = 8
    cfg.model.norm_dtype = "bfloat16"
    m16 = model_from_config(cfg)
    assert m16.norm_dtype == jnp.bfloat16
    cfg.model.norm_dtype = "float32"
    m32 = model_from_config(cfg)

    with pytest.raises(ValueError):
        cfg.model.norm_dtype = "float16"
        model_from_config(cfg)

    batch = _batch()
    losses = {}
    for tag, m in (("bf16", m16), ("f32", m32)):
        step = make_train_step(schedule, conditional=True)
        state = _make_state(m)
        state, metrics = step(state, batch)
        losses[tag] = float(metrics["loss"])
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(state.ema_params):
            assert leaf.dtype == jnp.float32
    # same params/batch/rng: the bf16-norm loss tracks f32 to bf16 eps
    assert abs(losses["bf16"] - losses["f32"]) < 3e-2, losses


def test_fused_prep_step(schedule):
    """uint8 batches run augment+normalize INSIDE the step jit (one upload,
    one dispatch per batch). With augmentation='none' the fused step must
    be bit-identical to prepare-then-step: the aug stream is folded OFF
    the step rng, so the diffusion-noise stream is untouched."""
    from superdiff_tpu.data.transforms import prepare_batch

    model = _tiny_model()
    u8 = (np.random.default_rng(0).random((B, RES, RES, 1)) * 255
          ).astype(np.uint8)
    labels = jnp.zeros((B,), jnp.int32)
    raw = {"image": jnp.asarray(u8), "label": labels}
    prepared = {"image": prepare_batch(jnp.asarray(u8), None, "none",
                                       "tanh"), "label": labels}

    fused = make_train_step(schedule, conditional=True,
                            augmentation="none", normalization="tanh")
    plain = make_train_step(schedule, conditional=True)
    s1, m1 = fused(_make_state(model), raw)
    s2, m2 = plain(_make_state(model), prepared)
    assert float(m1["loss"]) == float(m2["loss"])
    gn1, gn2 = float(m1["grad_norm"]), float(m2["grad_norm"])
    assert abs(gn1 - gn2) / gn1 < 1e-5, (gn1, gn2)
    # updated params agree to fusion-reassociation tolerance (the fused
    # and unfused graphs compile to different HLO, so the grad reductions
    # may associate differently; the math is identical)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)

    # stochastic augmentation inside the jit: runs, and changes what the
    # model sees. The out conv is zero-initialized, so the LOSS at init is
    # mean(eps^2) regardless of x — the gradient is the x-sensitive probe.
    aug = make_train_step(schedule, conditional=True,
                          augmentation="medium", normalization="tanh")
    _, m3 = aug(_make_state(model), raw)
    assert np.isfinite(float(m3["loss"]))
    assert float(m3["grad_norm"]) != float(m1["grad_norm"])


def test_fused_prep_step_sharded_matches_unsharded(schedule, devices8):
    """The production real-data path: a RAW uint8 batch, stochastically
    augmented + normalized INSIDE the mesh-sharded step. GSPMD partitions
    the same global program, so the sharded step must reproduce the
    single-device numbers exactly (same params/batch/rng — including the
    folded aug stream)."""
    model = _tiny_model()
    u8 = (np.random.default_rng(7).random((B, RES, RES, 1)) * 255
          ).astype(np.uint8)
    raw = {"image": jnp.asarray(u8),
           "label": jnp.zeros((B,), jnp.int32)}

    step_a = make_train_step(schedule, conditional=True,
                             augmentation="low", normalization="tanh")
    _, m_a = step_a(_make_state(model), raw)

    mesh = make_mesh(8)
    step_b = make_train_step(schedule, mesh=mesh, conditional=True,
                             augmentation="low", normalization="tanh")
    sharded = shard_batch(raw, mesh)
    assert sharded["image"].dtype == jnp.uint8
    assert len(sharded["image"].sharding.device_set) == 8
    _, m_b = step_b(_make_state(model), sharded)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_a["grad_norm"]),
                               float(m_b["grad_norm"]), rtol=1e-4)


def test_eval_step_uint8_matches_prepared(schedule):
    """The fused val path: a raw uint8 batch normalized inside the eval jit
    must score identically to eager prepare-then-eval (no augmentation in
    either — validation sees clean data)."""
    from superdiff_tpu.data.transforms import prepare_batch

    model = _tiny_model()
    state = _make_state(model)
    u8 = (np.random.default_rng(3).random((B, RES, RES, 1)) * 255
          ).astype(np.uint8)
    labels = jnp.zeros((B,), jnp.int32)

    ev = make_eval_step(schedule, conditional=True, normalization="tanh")
    l_raw = float(ev(state, {"image": jnp.asarray(u8), "label": labels}))
    l_prep = float(ev(state, {"image": prepare_batch(jnp.asarray(u8), None,
                                                     "none", "tanh"),
                              "label": labels}))
    assert l_raw == l_prep, (l_raw, l_prep)
    assert np.isfinite(l_raw)


def test_grad_accum_matches_manual_microbatch_mean(schedule):
    """grad_accum=k: ONE optimizer update on the mean of k microbatch
    grads, each microbatch drawing fold_in(step_rng, i). Pin the exact
    math by recomputing the k grads by hand (same rng derivation as
    steps.py) and comparing loss + grad_norm + the updated params against
    a manual single update on the averaged gradient."""
    from superdiff_tpu.diffusion.process import training_step as loss_impl

    k = 4
    model = _tiny_model()
    state = _make_state(model)       # donated by the step below
    ref = _make_state(model)         # identical twin for the manual math
    batch = _batch(conditional=True)

    step = make_train_step(schedule, conditional=True, grad_accum=k)
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    state = ref

    # manual re-derivation (rng plumbing mirrors steps.py exactly)
    rng, step_rng = jax.random.split(state.rng)
    step_rng = jax.random.fold_in(step_rng, state.step)
    micro_x = batch["image"].reshape((k, B // k, RES, RES, 1))
    micro_y = batch["label"].reshape((k, B // k))

    def loss_of(params, x, y, r):
        fn = lambda xt, t, yy: state.apply_fn(params, xt, t, yy)
        return loss_impl(schedule, fn, x, r, y=y)

    losses, grads = [], []
    for i in range(k):
        l, g = jax.value_and_grad(loss_of)(
            state.params, micro_x[i], micro_y[i],
            jax.random.fold_in(step_rng, i))
        losses.append(float(l))
        grads.append(g)
    mean_grad = jax.tree_util.tree_map(
        lambda *gs: sum(gs) / k, *grads)

    np.testing.assert_allclose(float(metrics["loss"]), np.mean(losses),
                               rtol=1e-5)
    manual_gn = float(jnp.sqrt(sum(
        jnp.sum(jnp.square(g.astype(jnp.float32)))
        for g in jax.tree_util.tree_leaves(mean_grad))))
    np.testing.assert_allclose(float(metrics["grad_norm"]), manual_gn,
                               rtol=1e-4)

    # one optimizer update on the averaged grad reproduces the new params
    updates, _ = state.tx.update(mean_grad, state.opt_state, state.params)
    expect = jax.tree_util.tree_map(lambda p, u: p + u, state.params,
                                    updates)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(expect)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_grad_accum_rejects_indivisible_batch(schedule):
    model = _tiny_model()
    state = _make_state(model)
    step = make_train_step(schedule, conditional=True, grad_accum=3)
    with pytest.raises(ValueError, match="not divisible"):
        step(state, _batch(conditional=True))   # B=8, k=3


def test_grad_accum_sharded(schedule, devices8):
    """grad_accum composes with the mesh-sharded step: same global program
    partitioned by GSPMD, so loss/grad_norm match the single-device
    grad-accum step exactly."""
    model = _tiny_model()
    batch = _batch(conditional=True)
    k = 2

    plain = make_train_step(schedule, conditional=True, grad_accum=k)
    s1, m1 = plain(_make_state(model), batch)

    mesh = make_mesh(8)
    sharded = make_train_step(schedule, mesh=mesh, conditional=True,
                              grad_accum=k)
    s2, m2 = sharded(_make_state(model), shard_batch(batch, mesh))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=1e-4)
