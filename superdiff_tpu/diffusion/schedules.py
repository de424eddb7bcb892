"""Diffusion noise schedules as pure functions over static arrays.

Reference semantics: ``src/models/ddpm.py:7-11`` — linear betas via
``torch.linspace(beta_start, beta_end, T)``, ``alphas = 1 - betas``,
``alpha_bars = cumprod(alphas)``. We precompute every derived quantity once
(the reference recomputes ``sqrt`` per step on the host and ships scalars to
the device inside its Python sampling loop, ``src/models/ddpm.py:37-39``; here
the whole schedule is a device-resident pytree folded into ``lax.scan``).

All arrays are float32; diffusion coefficient math is numerically sensitive so
we keep it out of bfloat16 regardless of the compute dtype of the model.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class DiffusionSchedule(NamedTuple):
    """Precomputed schedule tensors, each of shape ``(T,)`` (float32).

    A NamedTuple so it is a pytree: it can be closed over by jitted functions,
    donated, or carried through ``lax.scan`` without host round-trips.
    """

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alpha_bars: jnp.ndarray            # cumulative product of alphas
    alpha_bars_prev: jnp.ndarray       # alpha_bar[t-1], with alpha_bar[-1] := 1
    sqrt_alpha_bars: jnp.ndarray
    sqrt_one_minus_alpha_bars: jnp.ndarray
    sqrt_recip_alphas: jnp.ndarray     # 1/sqrt(alpha_t)
    posterior_variance: jnp.ndarray    # beta_t * (1-ab_{t-1}) / (1-ab_t)

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def linear_betas(num_timesteps: int = 1000,
                 beta_start: float = 1e-4,
                 beta_end: float = 0.02) -> np.ndarray:
    """Linear beta schedule (reference default, ``src/models/ddpm.py:7-9``)."""
    return np.linspace(beta_start, beta_end, num_timesteps, dtype=np.float64)


def cosine_betas(num_timesteps: int = 1000, s: float = 0.008,
                 max_beta: float = 0.999) -> np.ndarray:
    """Cosine schedule from Improved DDPM (Nichol & Dhariwal 2021, eq. 17).

    Not in the reference; part of the declared capability surface (better
    schedules for the conditional model family).
    """
    steps = np.arange(num_timesteps + 1, dtype=np.float64)
    f = np.cos((steps / num_timesteps + s) / (1 + s) * np.pi / 2) ** 2
    alpha_bars = f / f[0]
    betas = 1.0 - alpha_bars[1:] / alpha_bars[:-1]
    return np.clip(betas, 0.0, max_beta)


_SCHEDULES = {
    "linear": linear_betas,
    "cosine": cosine_betas,
}


def make_schedule(num_timesteps: int = 1000,
                  kind: str = "linear",
                  beta_start: float = 1e-4,
                  beta_end: float = 0.02) -> DiffusionSchedule:
    """Build the full precomputed :class:`DiffusionSchedule`.

    Derived quantities are computed in float64 on the host, then cast to
    float32 — cumprod over 1000 terms in float32 loses a few ulps that the
    parity tests (vs the reference formulas) would otherwise see.
    """
    if kind == "linear":
        betas = linear_betas(num_timesteps, beta_start, beta_end)
    elif kind == "cosine":
        betas = cosine_betas(num_timesteps)
    else:
        raise ValueError(f"unknown schedule kind: {kind!r} "
                         f"(have {sorted(_SCHEDULES)})")

    alphas = 1.0 - betas
    alpha_bars = np.cumprod(alphas)
    alpha_bars_prev = np.concatenate([[1.0], alpha_bars[:-1]])
    posterior_variance = betas * (1.0 - alpha_bars_prev) / (1.0 - alpha_bars)

    as_f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DiffusionSchedule(
        betas=as_f32(betas),
        alphas=as_f32(alphas),
        alpha_bars=as_f32(alpha_bars),
        alpha_bars_prev=as_f32(alpha_bars_prev),
        sqrt_alpha_bars=as_f32(np.sqrt(alpha_bars)),
        sqrt_one_minus_alpha_bars=as_f32(np.sqrt(1.0 - alpha_bars)),
        sqrt_recip_alphas=as_f32(np.sqrt(1.0 / alphas)),
        posterior_variance=as_f32(posterior_variance),
    )
