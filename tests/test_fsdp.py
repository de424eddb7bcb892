"""FSDP (ZeRO-3-style GSPMD state sharding) tests on the 8-device CPU mesh.

``parallel/fsdp.py`` shards every TrainState leaf (params, EMA, Adam
moments) over the ``data`` mesh axis and lets GSPMD insert the per-use
all-gathers / gradient reduce-scatters. These tests pin (a) the leaves
really shard (1/N per chip), (b) one donated train step matches the
replicated DP step, (c) updated state keeps its shardings, and (d) the
TP+FSDP composition on a (data=4, model=2) mesh holds parity too.
The reference has no parallelism of any kind (SURVEY.md §2.4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superdiff_tpu.diffusion import make_schedule
from superdiff_tpu.models import CondUNet
from superdiff_tpu.parallel import make_mesh, shard_batch, fsdp
from superdiff_tpu.training import create_train_state, make_train_step
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


def _init(model):
    x = jnp.zeros((B, RES, RES, 1))
    t = jnp.zeros((B,), jnp.int32)
    y = jnp.zeros((B,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, y)
    return params, (x, t, y)


def _batch(seed=0):
    imgs, labels = synthetic_xray_batch(B, RES, seed=seed)
    return {"image": jnp.asarray(imgs), "label": jnp.asarray(labels)}


def test_state_leaves_actually_shard(schedule):
    mesh = make_mesh()                                    # (data=8, model=1)
    model = _tiny_model()
    state = create_train_state(model, jax.random.PRNGKey(0),
                               _init(model)[1])
    sharded = fsdp.shard_state(state, mesh)

    flat = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_flatten_with_path(sharded.params)[0]}
    # a ResBlock conv kernel (3,3,8,8): Cout=8 divides 8 -> sharded 1/8
    c0 = next(v for k, v in flat.items()
              if "conv_0" in k and "kernel" in k and "down_1" in k)
    assert c0.addressable_shards[0].data.shape[3] == c0.shape[3] // 8
    # per-chip bytes across the whole param tree drop close to 1/8
    total = sum(v.size for v in flat.values())
    local = sum(int(np.prod(v.addressable_shards[0].data.shape))
                for v in flat.values())
    assert local < total / 4          # most leaves shard (some replicate)
    # EMA and Adam mirrors shard the same way
    ema = {jax.tree_util.keystr(k): v for k, v in
           jax.tree_util.tree_flatten_with_path(sharded.ema_params)[0]}
    e0 = next(v for k, v in ema.items()
              if "conv_0" in k and "kernel" in k and "down_1" in k)
    assert e0.addressable_shards[0].data.shape[3] == e0.shape[3] // 8
    # scalars / RNG stay replicated (never silently sharded)
    assert sharded.step.sharding.is_fully_replicated


def test_nondivisible_and_scalar_leaves_replicate():
    mesh = make_mesh()
    # 1-channel stem-like kernel: no dim divides 8 -> replicated
    leaf = jnp.zeros((3, 3, 1, 4))
    spec = fsdp.spec_for_leaf(leaf, mesh)
    assert spec == jax.sharding.PartitionSpec()
    # scalar
    assert fsdp.spec_for_leaf(jnp.zeros(()), mesh) == \
        jax.sharding.PartitionSpec()
    # prefer the LAST divisible dim (Cout before Cin)
    leaf = jnp.zeros((3, 3, 16, 8))
    assert fsdp.spec_for_leaf(leaf, mesh) == \
        jax.sharding.PartitionSpec(None, None, None, "data")


def test_fsdp_train_step_matches_replicated(schedule):
    """One donated train step under 8-way FSDP must produce the same loss
    and updated params as the replicated 8-way DP step."""
    mesh = make_mesh()
    model = _tiny_model()
    batch = _batch()

    state_dp = create_train_state(model, jax.random.PRNGKey(0),
                                  _init(model)[1])
    step_dp = make_train_step(schedule, mesh=mesh, conditional=True)
    new_dp, m_dp = step_dp(state_dp, shard_batch(batch, mesh))

    state_fs = create_train_state(model, jax.random.PRNGKey(0),
                                  _init(model)[1])
    sh = fsdp.state_shardings(state_fs, mesh)
    state_fs = fsdp.shard_state(state_fs, mesh)
    step_fs = make_train_step(schedule, mesh=mesh, conditional=True,
                              state_shardings=sh)
    new_fs, m_fs = step_fs(state_fs, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m_dp["loss"]), float(m_fs["loss"]),
                               rtol=1e-5, atol=1e-6)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(new_dp.params)[0],
            jax.tree_util.tree_flatten_with_path(new_fs.params)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(ka))
    # the updated state keeps its FSDP shardings (no re-replication)
    flat = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_flatten_with_path(new_fs.params)[0]}
    c0 = next(v for k, v in flat.items()
              if "conv_0" in k and "kernel" in k and "down_1" in k)
    assert c0.addressable_shards[0].data.shape[3] == c0.shape[3] // 8


def test_fsdp_composes_with_tp(schedule):
    """(data=4, model=2): TP claims the conv-pair channel axes on ``model``,
    FSDP claims a *different* dim on ``data`` — parity must still hold."""
    mesh = make_mesh(model_parallelism=2)
    model = _tiny_model()
    batch = _batch(seed=1)

    state_ref = create_train_state(model, jax.random.PRNGKey(0),
                                   _init(model)[1])
    step_ref = make_train_step(schedule, mesh=make_mesh(), conditional=True)
    new_ref, m_ref = step_ref(state_ref, shard_batch(batch, make_mesh()))

    state2 = create_train_state(model, jax.random.PRNGKey(0),
                                _init(model)[1])
    sh = fsdp.state_shardings(state2, mesh, tensor_parallel=True)
    state2 = fsdp.shard_state(state2, mesh, tensor_parallel=True)
    step2 = make_train_step(schedule, mesh=mesh, conditional=True,
                            state_shardings=sh)
    new2, m2 = step2(state2, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m_ref["loss"]), float(m2["loss"]),
                               rtol=1e-5, atol=1e-6)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(new_ref.params)[0],
            jax.tree_util.tree_flatten_with_path(new2.params)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(ka))
    # a conv_0 kernel carries BOTH axes: model on Cout (TP) + data on Cin
    flat = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_flatten_with_path(new2.params)[0]}
    c0 = next(v for k, v in flat.items()
              if "conv_0" in k and "kernel" in k and "down_1" in k)
    shard_shape = c0.addressable_shards[0].data.shape
    assert shard_shape[3] == c0.shape[3] // 2      # TP (model=2) on Cout
    assert shard_shape[2] == c0.shape[2] // 4      # FSDP (data=4) on Cin
