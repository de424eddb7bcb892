"""Ensemble-parallel SuperDiff tests on the 8-device CPU mesh.

``parallel/ep.py`` places each superposed model on its own ``model``-axis
slice so the M denoiser calls run concurrently (single-chip they are
sequential — the measured-faster arrangement there). These tests pin
exactness: EP samples AND Itô log-densities must match the sequential
path, OR and AND modes, composed with data parallelism on one mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superdiff_tpu.diffusion import make_schedule
from superdiff_tpu.diffusion.superdiff import superdiff_sample
from superdiff_tpu.models import CondUNet
from superdiff_tpu.parallel import make_mesh
from superdiff_tpu.parallel.ep import make_ep_eps_fn, stack_and_shard_params

RES = 8
B = 8


def _tiny_model():
    return CondUNet(base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
                    attn_resolutions=(), num_classes=2, time_emb_dim=16,
                    groups=4)


@pytest.fixture(scope="module")
def setup():
    model = _tiny_model()
    x = jnp.zeros((B, RES, RES, 1))
    t = jnp.zeros((B,), jnp.int32)
    y = jnp.zeros((B,), jnp.int32)
    p1 = model.init(jax.random.PRNGKey(0), x, t, y)
    p2 = model.init(jax.random.PRNGKey(7), x, t, y)

    def apply_fn(p, xx, tt, yy):
        return model.apply(p, xx, tt, yy)

    return model, apply_fn, p1, p2, y


@pytest.mark.parametrize("mode", ["or", "and"])
def test_ep_matches_sequential(setup, mode):
    _, apply_fn, p1, p2, y = setup
    schedule = make_schedule(40)
    shape = (B, RES, RES, 1)
    rng = jax.random.PRNGKey(3)

    seq_fns = [lambda xx, tt: apply_fn(p1, xx, tt, y),
               lambda xx, tt: apply_fn(p2, xx, tt, y)]
    x_ref, logq_ref = jax.jit(
        lambda r: superdiff_sample(schedule, seq_fns, shape, r, mode=mode)
    )(rng)

    mesh = make_mesh(model_parallelism=2)            # (data=4, model=2)
    eps_fn = make_ep_eps_fn(apply_fn, [p1, p2], mesh, y=y)
    x_ep, logq_ep = jax.jit(
        lambda r: superdiff_sample(schedule, eps_fn, shape, r, mode=mode,
                                   num_models=2))(rng)

    np.testing.assert_allclose(np.asarray(x_ep), np.asarray(x_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logq_ep), np.asarray(logq_ref),
                               rtol=2e-4, atol=2e-3)


def test_params_live_on_their_slice(setup):
    _, _, p1, p2, _ = setup
    mesh = make_mesh(model_parallelism=2)
    stacked = stack_and_shard_params([p1, p2], mesh)
    leaf = jax.tree_util.tree_leaves(stacked)[0]
    assert leaf.shape[0] == 2
    # each shard holds exactly one model's slice of the stacked axis
    assert leaf.addressable_shards[0].data.shape[0] == 1


def test_model_count_must_match_axis(setup):
    _, apply_fn, p1, p2, _ = setup
    mesh = make_mesh(model_parallelism=4)
    with pytest.raises(ValueError, match="mesh model=2"):
        make_ep_eps_fn(apply_fn, [p1, p2], mesh)
