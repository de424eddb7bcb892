"""Forward diffusion process and training losses (pure functions).

Reference semantics: ``src/models/ddpm.py:13-29`` —
``q_sample(x0, t, eps) = sqrt(ab_t) x0 + sqrt(1-ab_t) eps``;
``p_losses`` is the epsilon-prediction MSE; ``training_step`` draws uniform
timesteps per batch element. Here everything is functional: the model is an
apply function ``(x_t, t, *cond) -> eps_hat`` and RNG is explicit.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from superdiff_tpu.diffusion.schedules import DiffusionSchedule

# Model apply signature used throughout the framework:
#   eps_hat = model_fn(x_t, t)               (unconditional)
#   eps_hat = model_fn(x_t, t, y)            (class-conditional)
ModelFn = Callable[..., jnp.ndarray]


def _bcast_to(coeff: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a per-batch coefficient ``(B,)`` over image dims of ``x``."""
    return coeff.reshape(coeff.shape + (1,) * (x.ndim - 1))


def q_sample(schedule: DiffusionSchedule,
             x_start: jnp.ndarray,
             t: jnp.ndarray,
             noise: jnp.ndarray) -> jnp.ndarray:
    """Diffuse ``x_start`` to timestep ``t``: ``sqrt(ab) x0 + sqrt(1-ab) eps``.

    ``t`` is integer, shape ``(B,)``; images are NHWC (TPU-native layout).
    Matches ``src/models/ddpm.py:13-17``.
    """
    sqrt_ab = _bcast_to(schedule.sqrt_alpha_bars[t], x_start)
    sqrt_1mab = _bcast_to(schedule.sqrt_one_minus_alpha_bars[t], x_start)
    return sqrt_ab * x_start + sqrt_1mab * noise


def predict_x0_from_eps(schedule: DiffusionSchedule,
                        x_t: jnp.ndarray,
                        t: jnp.ndarray,
                        eps: jnp.ndarray) -> jnp.ndarray:
    """Invert ``q_sample``: ``x0 = (x_t - sqrt(1-ab) eps) / sqrt(ab)``."""
    sqrt_ab = _bcast_to(schedule.sqrt_alpha_bars[t], x_t)
    sqrt_1mab = _bcast_to(schedule.sqrt_one_minus_alpha_bars[t], x_t)
    return (x_t - sqrt_1mab * eps) / sqrt_ab


# --- prediction parameterizations --------------------------------------
#
# The network head can be trained to predict eps (the reference's only
# mode, src/models/ddpm.py:20-24), the clean image x0, or the "velocity"
# v = alpha eps - sigma x0 (Salimans & Ho 2022, arXiv:2202.00512 §2.4 —
# the parameterization that stays well-conditioned as step counts shrink,
# required for progressive distillation to 1-2 sampler steps). With
# alpha = sqrt(ab_t), sigma = sqrt(1-ab_t) and x_t = alpha x0 + sigma eps:
#
#   eps = sigma x_t + alpha v          x0 = alpha x_t - sigma v
#
# so any head converts to the eps the samplers consume with one fused
# multiply-add per call.

PARAMETERIZATIONS = ("eps", "v", "x0")


def pred_target(schedule: DiffusionSchedule,
                x_start: jnp.ndarray,
                t: jnp.ndarray,
                noise: jnp.ndarray,
                parameterization: str = "eps") -> jnp.ndarray:
    """The regression target for a head of the given parameterization."""
    if parameterization == "eps":
        return noise
    if parameterization == "x0":
        return x_start
    if parameterization == "v":
        a = _bcast_to(schedule.sqrt_alpha_bars[t], x_start)
        s = _bcast_to(schedule.sqrt_one_minus_alpha_bars[t], x_start)
        return a * noise - s * x_start
    raise ValueError(f"unknown parameterization: {parameterization!r}")


def eps_from_pred(schedule: DiffusionSchedule,
                  x_t: jnp.ndarray,
                  t: jnp.ndarray,
                  pred: jnp.ndarray,
                  parameterization: str = "eps") -> jnp.ndarray:
    """Convert a head prediction to the eps the samplers consume."""
    if parameterization == "eps":
        return pred
    a = _bcast_to(schedule.sqrt_alpha_bars[t], x_t)
    s = _bcast_to(schedule.sqrt_one_minus_alpha_bars[t], x_t)
    if parameterization == "v":
        return s * x_t + a * pred
    if parameterization == "x0":
        return (x_t - a * pred) / s
    raise ValueError(f"unknown parameterization: {parameterization!r}")


def x0_from_pred(schedule: DiffusionSchedule,
                 x_t: jnp.ndarray,
                 t: jnp.ndarray,
                 pred: jnp.ndarray,
                 parameterization: str = "eps") -> jnp.ndarray:
    """Convert a head prediction to the clean-image estimate."""
    if parameterization == "x0":
        return pred
    a = _bcast_to(schedule.sqrt_alpha_bars[t], x_t)
    s = _bcast_to(schedule.sqrt_one_minus_alpha_bars[t], x_t)
    if parameterization == "v":
        return a * x_t - s * pred
    if parameterization == "eps":
        return (x_t - s * pred) / a
    raise ValueError(f"unknown parameterization: {parameterization!r}")


def loss_weights(schedule: DiffusionSchedule,
                 t: jnp.ndarray,
                 weighting: str = "none",
                 min_snr_gamma: float = 5.0,
                 parameterization: str = "eps") -> jnp.ndarray:
    """Per-timestep loss weights ``(B,)``.

    ``min_snr`` (Hang et al. 2023, arXiv:2303.09556 eq. 9): the truncated
    SNR ``min(SNR_t, gamma)`` expressed in x0-units, converted to the
    head's own MSE space (``SNR_t = ab_t / (1 - ab_t)``):

    - eps head: ``min(SNR, gamma) / SNR``      (eps-MSE = SNR × x0-MSE)
    - v head:   ``min(SNR, gamma) / (SNR+1)``  (v-MSE = (SNR+1) × x0-MSE)
    - x0 head:  ``min(SNR, gamma)``

    Down-weights the easy low-noise timesteps whose huge SNR otherwise
    dominates the gradient, trading a slightly higher raw MSE for faster
    convergence of the quantities sampling cares about. Beyond the
    reference's uniform weighting (``src/models/ddpm.py:20-24``).
    """
    if weighting == "none":
        return jnp.ones_like(t, dtype=jnp.float32)
    if weighting == "min_snr":
        ab = schedule.alpha_bars[t].astype(jnp.float32)
        snr = ab / (1.0 - ab)
        trunc = jnp.minimum(snr, min_snr_gamma)
        if parameterization == "eps":
            return trunc / snr
        if parameterization == "v":
            return trunc / (snr + 1.0)
        if parameterization == "x0":
            return trunc
        raise ValueError(f"unknown parameterization: {parameterization!r}")
    raise ValueError(f"unknown loss weighting: {weighting!r}")


def p_losses(schedule: DiffusionSchedule,
             model_fn: ModelFn,
             x_start: jnp.ndarray,
             t: jnp.ndarray,
             rng: jax.Array,
             y: Optional[jnp.ndarray] = None,
             loss_type: str = "mse",
             weighting: str = "none",
             min_snr_gamma: float = 5.0,
             parameterization: str = "eps") -> jnp.ndarray:
    """Denoising loss at given timesteps; the regression target follows the
    head's ``parameterization`` (:func:`pred_target`).

    Reference: ``src/models/ddpm.py:20-24`` (uniform eps-MSE only).
    ``huber``, min-SNR timestep weighting (:func:`loss_weights`) and the
    v/x0 parameterizations added for the extended capability surface.
    """
    noise = jax.random.normal(rng, x_start.shape, dtype=x_start.dtype)
    x_noisy = q_sample(schedule, x_start, t, noise)
    args = (x_noisy, t) if y is None else (x_noisy, t, y)
    pred = model_fn(*args)
    target = pred_target(schedule, x_start, t, noise, parameterization)
    # Loss reduced in float32 even under bf16 compute.
    diff = (pred.astype(jnp.float32) - target.astype(jnp.float32))
    if loss_type == "mse":
        per_px = diff ** 2
    elif loss_type == "huber":
        per_px = jnp.where(jnp.abs(diff) < 1.0,
                           0.5 * diff ** 2,
                           jnp.abs(diff) - 0.5)
    else:
        raise ValueError(f"unknown loss_type: {loss_type!r}")
    if weighting == "none":
        return jnp.mean(per_px)
    w = loss_weights(schedule, t, weighting, min_snr_gamma,
                     parameterization)                        # (B,)
    per_sample = jnp.mean(per_px.reshape(per_px.shape[0], -1), axis=1)
    return jnp.mean(w * per_sample)


def training_step(schedule: DiffusionSchedule,
                  model_fn: ModelFn,
                  x: jnp.ndarray,
                  rng: jax.Array,
                  y: Optional[jnp.ndarray] = None,
                  loss_type: str = "mse",
                  weighting: str = "none",
                  min_snr_gamma: float = 5.0,
                  parameterization: str = "eps") -> jnp.ndarray:
    """One loss evaluation: sample ``t ~ U[0, T)`` per example, then losses.

    Reference: ``src/models/ddpm.py:26-29``.
    """
    rng_t, rng_noise = jax.random.split(rng)
    t = jax.random.randint(rng_t, (x.shape[0],), 0, schedule.num_timesteps)
    return p_losses(schedule, model_fn, x, t, rng_noise, y=y,
                    loss_type=loss_type, weighting=weighting,
                    min_snr_gamma=min_snr_gamma,
                    parameterization=parameterization)
