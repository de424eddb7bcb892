"""Tensor-parallel (Megatron-style GSPMD) tests on the 8-device CPU mesh.

The reference has no parallelism at all (SURVEY.md §2.4); TP here is the
"expose the axis so channels can shard" capability made executable:
``parallel/tp.py`` shards every ResBlock conv pair column/row over the
``model`` mesh axis and lets GSPMD insert the collectives. These tests pin
(a) the leaves really shard, (b) forward parity, (c) full-train-step parity
vs the replicated DP path, composing TP with DP on one mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superdiff_tpu.diffusion import make_schedule
from superdiff_tpu.models import CondUNet
from superdiff_tpu.parallel import (make_mesh, shard_batch, param_shardings,
                                    shard_params, state_shardings,
                                    shard_state, MODEL_AXIS)
from superdiff_tpu.training import create_train_state, make_train_step
from superdiff_tpu.data import synthetic_xray_batch

RES = 16
B = 8


@pytest.fixture(scope="module")
def schedule():
    return make_schedule(100)


def _tiny_model():
    # groups=4 divides the model-axis sizes used here (2, 4): each shard
    # holds whole GroupNorm groups, the locality case documented in tp.py
    return CondUNet(base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
                    attn_resolutions=(), num_classes=2, time_emb_dim=16,
                    groups=4)


def _init(model):
    x = jnp.zeros((B, RES, RES, 1))
    t = jnp.zeros((B,), jnp.int32)
    y = jnp.zeros((B,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, y)
    return params, (x, t, y)


def _batch(seed=0):
    imgs, labels = synthetic_xray_batch(B, RES, seed=seed)
    return {"image": jnp.asarray(imgs), "label": jnp.asarray(labels)}


def test_conv_pair_leaves_actually_shard():
    mesh = make_mesh(model_parallelism=2)        # (data=4, model=2)
    model = _tiny_model()
    params, _ = _init(model)
    sharded = shard_params(params, mesh)

    flat = {jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_flatten_with_path(sharded)[0]}
    c0 = next(v for k, v in flat.items()
              if "conv_0" in k and "kernel" in k and "down_1" in k)
    c1 = next(v for k, v in flat.items()
              if "conv_1" in k and "kernel" in k and "down_1" in k)
    # column-parallel: out-channel axis halved per shard
    assert c0.addressable_shards[0].data.shape[3] == c0.shape[3] // 2
    # row-parallel: in-channel axis halved per shard
    assert c1.addressable_shards[0].data.shape[2] == c1.shape[2] // 2
    # replicated elsewhere (stem conv has 1 input channel -> guarded)
    emb = next(v for k, v in flat.items() if "class_emb" in k)
    assert len(emb.sharding.device_set) == 8
    assert emb.addressable_shards[0].data.shape == emb.shape


def test_guard_drops_nondivisible_axes():
    mesh = make_mesh(model_parallelism=4)
    # channels 8/16 with model=4: 8%4==0 so conv kernels shard; a fake
    # 2-channel leaf under a conv_0 path must fall back to replicated
    from superdiff_tpu.parallel.tp import _guarded, spec_for_path
    leaf = jnp.zeros((3, 3, 4, 2))
    path = (jax.tree_util.DictKey("conv_0"), jax.tree_util.DictKey("kernel"))
    spec = spec_for_path(path, leaf)
    assert _guarded(spec, leaf, mesh) == jax.sharding.PartitionSpec()


@pytest.mark.parametrize("mp", [2, 4])
def test_tp_forward_parity(mp):
    mesh = make_mesh(model_parallelism=mp)
    model = _tiny_model()
    params, (x, t, y) = _init(model)
    xin = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    tin = jnp.arange(B, dtype=jnp.int32) * 7
    ref = model.apply(params, xin, tin, y)

    sharded = shard_params(params, mesh)
    out = jax.jit(lambda p: model.apply(p, xin, tin, y))(sharded)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=2e-5, atol=2e-5)


def test_tp_train_step_matches_replicated(schedule):
    """One donated train step under (data=4, model=2) TP must produce the
    same loss and updated params as the replicated 8-way DP step."""
    mesh_dp = make_mesh()
    mesh_tp = make_mesh(model_parallelism=2)
    model = _tiny_model()
    batch = _batch()

    state_dp = create_train_state(model, jax.random.PRNGKey(0),
                                  _init(model)[1])
    step_dp = make_train_step(schedule, mesh=mesh_dp, conditional=True)
    new_dp, m_dp = step_dp(state_dp, shard_batch(batch, mesh_dp))

    state_tp = create_train_state(model, jax.random.PRNGKey(0),
                                  _init(model)[1])
    sh = state_shardings(state_tp, mesh_tp)
    state_tp = shard_state(state_tp, mesh_tp)
    step_tp = make_train_step(schedule, mesh=mesh_tp, conditional=True,
                              state_shardings=sh)
    new_tp, m_tp = step_tp(state_tp, shard_batch(batch, mesh_tp))

    np.testing.assert_allclose(float(m_dp["loss"]), float(m_tp["loss"]),
                               rtol=1e-5, atol=1e-6)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(new_dp.params)[0],
            jax.tree_util.tree_flatten_with_path(new_tp.params)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(ka))
    # updated params keep their TP shardings (no silent re-replication)
    flat = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_flatten_with_path(new_tp.params)[0]}
    c0 = next(v for k, v in flat.items()
              if "conv_0" in k and "kernel" in k and "down_1" in k)
    assert c0.addressable_shards[0].data.shape[3] == c0.shape[3] // 2


def test_tp_sampling_smoke(schedule):
    """DDIM sampling with TP-sharded params on a (data=2, model=4) mesh:
    sharded batch out, finite values, parity with the replicated run."""
    from superdiff_tpu.diffusion import ddim_sample
    from superdiff_tpu.parallel import shard_sample

    mesh = make_mesh(model_parallelism=4)
    model = _tiny_model()
    params, (x, t, y) = _init(model)
    sharded = shard_params(params, mesh)
    shape = (B, RES, RES, 1)
    rng = jax.random.PRNGKey(2)

    def fn_of(p):
        return lambda xx, tt, yy: model.apply(p, xx, tt, yy)

    ref = ddim_sample(schedule, fn_of(params), shape, rng, num_steps=5, y=y)
    sampler = shard_sample(
        lambda r: ddim_sample(schedule, fn_of(sharded), shape, r,
                              num_steps=5, y=y), mesh)
    out = sampler(rng)
    assert out.shape == shape and bool(jnp.isfinite(out).all())
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=2e-4, atol=2e-4)
