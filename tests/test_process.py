"""Forward-process and loss tests (reference math: ``src/models/ddpm.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superdiff_tpu.diffusion import make_schedule, q_sample, p_losses, \
    training_step
from superdiff_tpu.diffusion.process import predict_x0_from_eps


@pytest.fixture(scope="module")
def schedule():
    return make_schedule(1000)


def test_q_sample_matches_formula(schedule, rng):
    x0 = jax.random.normal(rng, (4, 8, 8, 1))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([0, 10, 500, 999])
    xt = q_sample(schedule, x0, t, noise)
    ab = np.asarray(schedule.alpha_bars)[np.asarray(t)]
    expect = (np.sqrt(ab)[:, None, None, None] * np.asarray(x0)
              + np.sqrt(1 - ab)[:, None, None, None] * np.asarray(noise))
    np.testing.assert_allclose(np.asarray(xt), expect, rtol=1e-5, atol=1e-6)


def test_q_sample_t0_nearly_identity(schedule, rng):
    x0 = jax.random.normal(rng, (2, 4, 4, 1))
    noise = jnp.zeros_like(x0)
    xt = q_sample(schedule, x0, jnp.zeros(2, dtype=jnp.int32), noise)
    np.testing.assert_allclose(np.asarray(xt), np.asarray(x0) *
                               np.sqrt(1 - 1e-4), rtol=1e-5)


def test_predict_x0_inverts_q_sample(schedule, rng):
    x0 = jax.random.normal(rng, (3, 8, 8, 1))
    noise = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    t = jnp.array([5, 123, 999])
    xt = q_sample(schedule, x0, t, noise)
    x0_rec = predict_x0_from_eps(schedule, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0),
                               rtol=1e-3, atol=1e-3)


def test_p_losses_zero_for_oracle(schedule, rng):
    """A model that returns the exact noise drives the loss to ~0."""
    x0 = jax.random.normal(rng, (2, 8, 8, 1))
    t = jnp.array([100, 200])
    noise_rng = jax.random.PRNGKey(7)
    expected_noise = jax.random.normal(noise_rng, x0.shape)

    def oracle(x_noisy, tt):
        return expected_noise

    loss = p_losses(schedule, oracle, x0, t, noise_rng)
    assert float(loss) < 1e-10


def test_p_losses_conditional_path(schedule, rng):
    x0 = jax.random.normal(rng, (2, 8, 8, 1))
    seen = {}

    def model(x, t, y):
        seen["y"] = y
        return jnp.zeros_like(x)

    t = jnp.array([1, 2])
    loss = p_losses(schedule, model, x0, t, rng, y=jnp.array([0, 1]))
    assert np.asarray(seen["y"]).tolist() == [0, 1]
    assert float(loss) > 0


def test_training_step_t_in_range(schedule, rng):
    captured = {}

    def model(x, t):
        captured["t"] = t
        return jnp.zeros_like(x)

    x = jax.random.normal(rng, (16, 4, 4, 1))
    training_step(schedule, model, x, rng)
    t = np.asarray(captured["t"])
    assert t.shape == (16,)
    assert (t >= 0).all() and (t < 1000).all()


def test_huber_loss_and_bad_loss(schedule, rng):
    x0 = jax.random.normal(rng, (2, 4, 4, 1))
    t = jnp.array([1, 2])
    model = lambda x, tt: jnp.zeros_like(x)
    l = p_losses(schedule, model, x0, t, rng, loss_type="huber")
    assert np.isfinite(float(l))
    with pytest.raises(ValueError):
        p_losses(schedule, model, x0, t, rng, loss_type="nope")


def test_training_step_jits(schedule, rng):
    model = lambda x, t: jnp.zeros_like(x)
    f = jax.jit(lambda x, r: training_step(schedule, model, x, r))
    x = jax.random.normal(rng, (4, 4, 4, 1))
    loss = f(x, rng)
    assert np.isfinite(float(loss))


# --------------------------------------------------- min-SNR loss weighting ---

def test_loss_weights_formula(schedule):
    """min-SNR (arXiv:2303.09556): w = min(SNR, gamma)/SNR, SNR = ab/(1-ab).
    High-SNR (low t) clamps to gamma/SNR < 1; low-SNR (high t) stays 1."""
    import numpy as np
    from superdiff_tpu.diffusion.process import loss_weights

    t = jnp.arange(schedule.num_timesteps, dtype=jnp.int32)
    w = np.asarray(loss_weights(schedule, t, "min_snr", 5.0))
    ab = np.asarray(schedule.alpha_bars)
    snr = ab / (1 - ab)
    np.testing.assert_allclose(w, np.minimum(snr, 5.0) / snr, rtol=1e-5)
    assert w[0] < 1e-2        # t=0: enormous SNR -> heavily down-weighted
    assert w[-1] == 1.0       # t=T-1: SNR << gamma -> unweighted
    uniform = np.asarray(loss_weights(schedule, t, "none"))
    np.testing.assert_array_equal(uniform, np.ones_like(uniform))


def test_p_losses_weighted_vs_uniform(schedule, rng):
    """Weighted loss equals the uniform loss when all weights are 1 (high-t
    batch) and differs on a low-t batch; unknown weighting raises."""
    import numpy as np
    import pytest
    from superdiff_tpu.diffusion.process import p_losses

    x = jax.random.normal(rng, (4, 8, 8, 1))
    model = lambda xt, t: 0.1 * xt

    t_hi = jnp.full((4,), schedule.num_timesteps - 1, dtype=jnp.int32)
    a = p_losses(schedule, model, x, t_hi, rng)
    b = p_losses(schedule, model, x, t_hi, rng, weighting="min_snr")
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)

    t_lo = jnp.zeros((4,), dtype=jnp.int32)
    u = p_losses(schedule, model, x, t_lo, rng)
    w = p_losses(schedule, model, x, t_lo, rng, weighting="min_snr")
    assert float(w) < 0.02 * float(u)   # t=0 weight ~ gamma/SNR << 1

    with pytest.raises(ValueError):
        p_losses(schedule, model, x, t_lo, rng, weighting="p2")
