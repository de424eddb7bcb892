"""SuperDiff validation.

The Itô density estimator has no reference implementation to compare with
(the reference repo contains zero superposition code — SURVEY.md §2.3), so
correctness is established against *analytic* Gaussian diffusions, where the
optimal denoiser and the true log-density are known in closed form:

data ~ N(mu, I)  =>  q_t = N(mu sqrt(ab_t), I)  (unit variance is preserved
by the VP forward process), optimal eps(x,t) = sigma_t * (x - mu sqrt(ab_t)),
and log q_0(x) = log N(x; mu, I).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superdiff_tpu.diffusion import make_schedule, ddpm_sample
from superdiff_tpu.diffusion.superdiff import superdiff_sample

T = 400
SHAPE = (4, 8, 8, 1)
D = 64  # 8*8*1


@pytest.fixture(scope="module")
def schedule():
    return make_schedule(T)


def gaussian_model(mu, schedule):
    """Optimal eps-predictor for data ~ N(mu, I)."""

    def fn(x, t):
        ab = schedule.alpha_bars[t].reshape(-1, 1, 1, 1)
        sigma = schedule.sqrt_one_minus_alpha_bars[t].reshape(-1, 1, 1, 1)
        return sigma * (x - mu * jnp.sqrt(ab))

    return fn


def analytic_logq(x, mu):
    diff = np.asarray(x - mu).reshape(x.shape[0], -1)
    return -0.5 * (diff ** 2).sum(-1) - 0.5 * D * math.log(2 * math.pi)


def test_fixed_pure_model_matches_ddpm(schedule, rng):
    """kappa=[1,0] must reproduce single-model DDPM sampling exactly."""
    m1 = gaussian_model(0.5, schedule)
    m2 = gaussian_model(-0.5, schedule)
    x_super, _ = superdiff_sample(schedule, [m1, m2], SHAPE, rng,
                                  mode="fixed", kappa=[1.0, 0.0])
    x_plain = ddpm_sample(schedule, m1, SHAPE, rng)
    np.testing.assert_allclose(np.asarray(x_super), np.asarray(x_plain),
                               rtol=1e-4, atol=1e-4)


def test_ito_estimator_matches_analytic_gaussian(schedule, rng):
    """Tracked log q at t=0 ~= closed-form Gaussian log-density."""
    mu = 0.3
    m = gaussian_model(mu, schedule)
    m2 = gaussian_model(mu, schedule)  # same model twice; both tracked
    x, logq = superdiff_sample(schedule, [m, m2], SHAPE, rng,
                               mode="fixed", kappa=[0.5, 0.5])
    expect = analytic_logq(x, mu)
    got = np.asarray(logq[0])
    # discretization error over T steps: a few percent of |logq| (~60)
    np.testing.assert_allclose(got, expect, rtol=0.08, atol=3.0)
    np.testing.assert_allclose(np.asarray(logq[0]), np.asarray(logq[1]),
                               rtol=1e-5)


def test_ito_discriminates_models(schedule, rng):
    """Sampling purely from model 1 must give logq_1 > logq_2 when the
    models are well separated."""
    m1 = gaussian_model(0.8, schedule)
    m2 = gaussian_model(-0.8, schedule)
    x, logq = superdiff_sample(schedule, [m1, m2], SHAPE, rng,
                               mode="fixed", kappa=[1.0, 0.0])
    assert (np.asarray(logq[0]) > np.asarray(logq[1])).all()
    # samples should be near mu_1
    mean_pix = float(np.asarray(x).mean())
    assert abs(mean_pix - 0.8) < 0.2, mean_pix


def test_or_mode_samples_from_mixture(schedule, rng):
    m1 = gaussian_model(0.8, schedule)
    m2 = gaussian_model(-0.8, schedule)
    big = (16, 8, 8, 1)
    x, logq = superdiff_sample(schedule, [m1, m2], big, rng, mode="or")
    means = np.asarray(x).mean(axis=(1, 2, 3))
    # every sample should land near one of the two modes
    near1 = np.abs(means - 0.8) < 0.3
    near2 = np.abs(means + 0.8) < 0.3
    assert (near1 | near2).all(), means
    # and (for a fair rng) both modes should be visited
    assert near1.any() and near2.any(), means


def test_and_mode_equalizes_densities(schedule, rng):
    m1 = gaussian_model(0.4, schedule)
    m2 = gaussian_model(-0.4, schedule)
    x, logq = superdiff_sample(schedule, [m1, m2], SHAPE, rng, mode="and")
    diff = np.asarray(logq[0] - logq[1])
    # the AND constraint drives per-step dL1==dL2; the residual gap is the
    # (shared) prior start so it should be near zero at the end
    assert np.abs(diff).max() < 3.0, diff
    # samples sit between the modes
    means = np.asarray(x).mean(axis=(1, 2, 3))
    assert (np.abs(means) < 0.35).all(), means


def test_mode_validation(schedule, rng):
    m = gaussian_model(0.0, schedule)
    with pytest.raises(ValueError):
        superdiff_sample(schedule, [m, m], SHAPE, rng, mode="xor")
    with pytest.raises(ValueError):
        superdiff_sample(schedule, [m], SHAPE, rng)
    with pytest.raises(ValueError):
        superdiff_sample(schedule, [m, m], SHAPE, rng, mode="fixed")
    with pytest.raises(ValueError):
        superdiff_sample(schedule, [m, m, m], SHAPE, rng, mode="and")


def test_superdiff_jits(schedule, rng):
    m1 = gaussian_model(0.5, schedule)
    m2 = gaussian_model(-0.5, schedule)
    f = jax.jit(lambda r: superdiff_sample(schedule, [m1, m2], SHAPE, r,
                                           mode="or"))
    x, logq = f(rng)
    assert np.isfinite(np.asarray(x)).all()
    assert np.isfinite(np.asarray(logq)).all()


def test_stacked_call_matches_sequential(schedule, rng):
    """stack_eps_fns + num_models must reproduce the per-model-closure path
    bit-for-bit: same math, one vmapped dispatch instead of M."""
    from superdiff_tpu.diffusion.superdiff import stack_eps_fns

    def apply_fn(params, x, t):
        mu = params["mu"]
        ab = schedule.alpha_bars[t].reshape(-1, 1, 1, 1)
        sigma = schedule.sqrt_one_minus_alpha_bars[t].reshape(-1, 1, 1, 1)
        return sigma * (x - mu * jnp.sqrt(ab))

    params = [{"mu": jnp.float32(0.5)}, {"mu": jnp.float32(-0.5)}]
    stacked = stack_eps_fns(apply_fn, params)
    fns = [lambda x, t: apply_fn(params[0], x, t),
           lambda x, t: apply_fn(params[1], x, t)]
    for mode, kw in (("or", {}), ("and", {}),
                     ("fixed", {"kappa": [0.3, 0.7]})):
        x_seq, lq_seq = superdiff_sample(schedule, fns, SHAPE, rng,
                                         mode=mode, **kw)
        x_stk, lq_stk = superdiff_sample(schedule, stacked, SHAPE, rng,
                                         mode=mode, num_models=2, **kw)
        np.testing.assert_allclose(np.asarray(x_stk), np.asarray(x_seq),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lq_stk), np.asarray(lq_seq),
                                   rtol=1e-4, atol=1e-3)


def test_stacked_call_requires_num_models(schedule, rng):
    with pytest.raises(ValueError, match="num_models"):
        superdiff_sample(schedule, lambda x, t: None, SHAPE, rng)


def test_superdiff_trajectory_frames(schedule, rng):
    m1 = gaussian_model(0.5, schedule)
    m2 = gaussian_model(-0.5, schedule)
    x, lq, frames = superdiff_sample(schedule, [m1, m2], SHAPE, rng,
                                     num_frames=6)
    assert frames.shape == (6,) + SHAPE
    assert np.isfinite(np.asarray(frames)).all()
    # final frame IS the final state
    np.testing.assert_allclose(np.asarray(frames[-1]), np.asarray(x),
                               rtol=1e-6, atol=1e-6)
