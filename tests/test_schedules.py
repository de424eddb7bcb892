"""Golden-value tests for schedules vs independent numpy re-derivations of
the reference formulas (``src/models/ddpm.py:7-11``)."""

import numpy as np
import jax.numpy as jnp

from superdiff_tpu.diffusion.schedules import (
    make_schedule, linear_betas, cosine_betas)


def test_linear_betas_matches_linspace():
    s = make_schedule(1000)
    expect = np.linspace(1e-4, 0.02, 1000)
    np.testing.assert_allclose(np.asarray(s.betas), expect, rtol=1e-6)
    assert s.num_timesteps == 1000


def test_derived_quantities():
    s = make_schedule(1000)
    betas = np.linspace(1e-4, 0.02, 1000)
    alphas = 1 - betas
    ab = np.cumprod(alphas)
    np.testing.assert_allclose(np.asarray(s.alphas), alphas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.alpha_bars), ab, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s.sqrt_alpha_bars),
                               np.sqrt(ab), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s.sqrt_one_minus_alpha_bars),
                               np.sqrt(1 - ab), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s.sqrt_recip_alphas),
                               1 / np.sqrt(alphas), rtol=1e-6)


def test_alpha_bars_prev_shifts():
    s = make_schedule(100)
    ab = np.asarray(s.alpha_bars)
    abp = np.asarray(s.alpha_bars_prev)
    assert abp[0] == 1.0
    np.testing.assert_allclose(abp[1:], ab[:-1], rtol=1e-6)


def test_posterior_variance_positive_and_small():
    s = make_schedule(1000)
    pv = np.asarray(s.posterior_variance)
    assert (pv >= 0).all()
    assert pv[-1] < np.asarray(s.betas)[-1] + 1e-6


def test_cosine_schedule_monotone_alpha_bar():
    betas = cosine_betas(1000)
    assert betas.shape == (1000,)
    assert (betas > 0).all() and (betas <= 0.999).all()
    ab = np.cumprod(1 - betas)
    assert (np.diff(ab) < 0).all()


def test_custom_range_and_T():
    s = make_schedule(10, beta_start=1e-3, beta_end=0.1)
    expect = np.linspace(1e-3, 0.1, 10)
    np.testing.assert_allclose(np.asarray(s.betas), expect, rtol=1e-6)


def test_unknown_kind_raises():
    import pytest
    with pytest.raises(ValueError):
        make_schedule(10, kind="quadratic")
