"""SuperDiff: score superposition with the Itô density estimator.

The reference's README and repo name promise this capability; **zero code
implements it there** (SURVEY.md §2.3: no grep hit for ito/superpos/density).
This module is the from-scratch TPU-native implementation, following
"Superposition of Diffusion Models Using the Itô Density Estimator"
(Skreta et al., arXiv:2412.17762).

Math (derived; continuous-time, VP forward SDE ``dx = f dt + g dW`` with
``f = -beta/2 x``, ``g^2 = beta``): tracking ``L_i = log q_i(x_t, t)`` along
*any* simulated reverse trajectory, Itô's lemma plus the Fokker-Planck
equation for ``q_i`` cancel the Hessian-trace terms, leaving the fully
analytic per-step update (no Hutchinson estimator, no extra VJPs):

    dL_i = <s_i, dx>  +  [ div f + <s_i, f> - g^2/2 ||s_i||^2 ] dtau
         = <s_i, dx>  -  beta_t/2 * ( d  +  <s_i, x>  +  ||s_i||^2 )

with ``s_i = -eps_i / sqrt(1 - alpha_bar_t)`` the model-i score, ``d`` the
data dimension, ``dx`` the realized update (noise included), and ``beta_t``
absorbing the discrete step size. Everything vectorizes over batch and
models — ideal for ``lax.scan`` on TPU.

Mixing modes each step (kappa over models):
- ``"or"``   — sample from the mixture: kappa = softmax(T*(L + bias)); the
  superposed score is sum_i kappa_i s_i  (paper's logical OR).
- ``"and"``  — equal densities: for two models, kappa solved in closed form
  each step so that dL_1 = dL_2 (+ bias), since dL is affine in kappa once
  the step noise is fixed (paper's logical AND).
- ``"fixed"``— constant user weights.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from superdiff_tpu.diffusion.schedules import DiffusionSchedule
from superdiff_tpu.diffusion.process import _bcast_to
from superdiff_tpu.diffusion.samplers import make_frame_recorder

MIX_MODES = ("or", "and", "fixed")


def stack_eps_fns(apply_fn: Callable, params_list: Sequence) -> Callable:
    """Fuse M same-architecture eps models into ONE batched call.

    Stacks the M parameter pytrees on a leading axis and vmaps the apply
    function over it, so each sampler step issues a single XLA computation
    with an M-major batch — the multi-model analogue of the CFG 2B-stacked
    call (:func:`~superdiff_tpu.diffusion.samplers._guided_eps`). Returns
    ``fn(x, t) -> (M, B, ...)`` suitable for
    ``superdiff_sample(..., model_fns=fn, num_models=M)``.

    Measured caveat (v5e, eff256, batch 16, scripts/bench_superdiff.py):
    for conv UNets this is SLOWER than M sequential calls inside the same
    jit (0.686 vs 0.822 samples/sec) — unlike CFG, which batches the *data*
    under shared weights, vmapping over params makes every conv an M-kernel
    batched conv, which XLA lowers off the fast path. The CLIs therefore
    default to sequential per-model closures; use this only where measured
    to win (e.g. matmul-dominated models).
    """
    stacked = jax.tree_util.tree_map(
        lambda *ps: jnp.stack(ps), *params_list)

    def fn(x, t):
        return jax.vmap(lambda p: apply_fn(p, x, t),
                        in_axes=0, out_axes=0)(stacked)

    return fn


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-example inner product over all non-batch dims -> (B,)."""
    return jnp.sum((a * b).astype(jnp.float32),
                   axis=tuple(range(1, a.ndim)))


def ito_logdensity_step(schedule: DiffusionSchedule,
                        t_scalar: jnp.ndarray,
                        x: jnp.ndarray,
                        scores: jnp.ndarray,
                        dx: jnp.ndarray) -> jnp.ndarray:
    """One Itô update of ``log q_i`` for every model.

    ``scores``: (M, B, H, W, C) per-model scores at (x, t);
    ``dx``: realized update ``x_next - x``; returns (M, B) increments.
    """
    beta = schedule.betas[t_scalar]
    d = float(math.prod(x.shape[1:]))
    term_dx = jax.vmap(lambda s: _dot(s, dx))(scores)          # (M, B)
    term_x = jax.vmap(lambda s: _dot(s, x))(scores)            # (M, B)
    term_ss = jax.vmap(lambda s: _dot(s, s))(scores)           # (M, B)
    return term_dx - 0.5 * beta * (d + term_x + term_ss)


def _mix_kappa_or(logq: jnp.ndarray, temperature: float,
                  bias: jnp.ndarray) -> jnp.ndarray:
    """(M, B) log-densities -> (M, B) softmax weights over models."""
    return jax.nn.softmax(temperature * (logq + bias[:, None]), axis=0)


def _mix_kappa_and(schedule: DiffusionSchedule,
                   t_scalar: jnp.ndarray,
                   x: jnp.ndarray,
                   scores: jnp.ndarray,
                   dx_base: jnp.ndarray,
                   dx_coef: jnp.ndarray,
                   bias: jnp.ndarray,
                   logq: jnp.ndarray) -> jnp.ndarray:
    """Closed-form kappa for the two-model AND mode.

    The realized update is ``dx = dx_base + kappa * dx_coef`` (affine in
    kappa with the step noise already fixed). Solve per batch element for
    the kappa that *closes the cumulative density gap* this step
    (``L_1 + dL_1 == L_2 + dL_2 + bias_target``) — feedback on the running
    totals, so clipped/ill-conditioned early steps (where the two scores
    coincide and the solve is unidentifiable) self-correct later instead of
    accumulating.
    """
    assert scores.shape[0] == 2, "AND mode supports exactly two models"
    beta = schedule.betas[t_scalar]
    s1, s2 = scores[0], scores[1]
    ds = s1 - s2
    # dL_1 - dL_2 = <ds, dx> - beta/2 (<ds, x> + ||s1||^2 - ||s2||^2)
    const = (_dot(ds, dx_base)
             - 0.5 * beta * (_dot(ds, x) + _dot(s1, s1) - _dot(s2, s2)))
    slope = _dot(ds, dx_coef)
    target = (bias[0] - bias[1]) + (logq[1] - logq[0])
    safe_slope = jnp.where(jnp.abs(slope) < 1e-8,
                           jnp.where(slope < 0, -1e-8, 1e-8), slope)
    kappa1 = (target - const) / safe_slope
    # keep the mixture sane when the linear solve is ill-conditioned, but
    # allow moderate extrapolation beyond [0,1] (exact equalization often
    # needs it; hard-clipping to [0,1] leaves a density gap)
    kappa1 = jnp.clip(kappa1, -2.0, 3.0)
    return jnp.stack([kappa1, 1.0 - kappa1], axis=0)          # (2, B)


def superdiff_sample(
        schedule: DiffusionSchedule,
        model_fns,
        shape: Tuple[int, ...],
        rng: jax.Array,
        mode: str = "or",
        kappa: Optional[Sequence[float]] = None,
        temperature: float = 1.0,
        bias: Optional[Sequence[float]] = None,
        num_models: Optional[int] = None,
        num_frames: int = 0,
        dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Superposed DDPM ancestral sampling across M models.

    ``model_fns`` is either a sequence of per-model functions
    ``(x, t) -> eps_i`` (bind labels/params with closures), or — the fast
    path for same-architecture models — ONE stacked function
    ``(x, t) -> (M, B, ...)`` built by :func:`stack_eps_fns` (pass
    ``num_models=M`` then). Returns ``(samples, logq)`` where ``logq``
    is ``(M, B)`` — the Itô estimate of each model's log-density at the
    final sample (up to the shared Gaussian-prior constant at t=T, which is
    included) — plus a ``(num_frames, B, ...)`` trajectory stack when
    ``num_frames > 0``.

    The whole loop — model calls, density accumulation, mixing — is one
    ``lax.scan``; with data-parallel sharding the batch dim shards and XLA
    reduces nothing across devices (densities are per-sample).
    """
    if mode not in MIX_MODES:
        raise ValueError(f"unknown mode {mode!r} (have {MIX_MODES})")
    stacked_call = callable(model_fns)
    if stacked_call:
        if not num_models:
            raise ValueError("num_models is required with a stacked "
                             "model_fns callable")
        M = num_models
        eps_fn = model_fns
    else:
        M = len(model_fns)

        def eps_fn(x, t):
            return jnp.stack([fn(x, t) for fn in model_fns], axis=0)

    if M < 2:
        raise ValueError("superposition needs >= 2 models")
    if mode == "and" and M != 2:
        raise ValueError("AND mode supports exactly two models")
    if mode == "fixed":
        if kappa is None or len(kappa) != M:
            raise ValueError("fixed mode requires kappa of length M")
        kappa_fixed = jnp.asarray(kappa, dtype=jnp.float32)[:, None]
    bias_arr = (jnp.asarray(bias, dtype=jnp.float32) if bias is not None
                else jnp.zeros((M,), dtype=jnp.float32))

    T = schedule.num_timesteps
    B = shape[0]
    d = float(math.prod(shape[1:]))

    rng, init_rng = jax.random.split(rng)
    x_init = jax.random.normal(init_rng, shape, dtype=dtype)
    # log N(x_T; 0, I) — identical across models, so relative weights start
    # even, but absolute values are meaningful.
    logq0 = (-0.5 * _dot(x_init, x_init)
             - 0.5 * d * math.log(2.0 * math.pi))
    logq_init = jnp.tile(logq0[None, :], (M, 1))               # (M, B)

    recording = num_frames > 0
    if recording:
        init_buf, record = make_frame_recorder(T, num_frames)
        frames0 = init_buf(shape, dtype)
    else:
        frames0 = jnp.zeros((0,))

    def step(carry, scan_in):
        x, key, logq, frames = carry
        pos, t_scalar = scan_in
        key, nkey = jax.random.split(key)
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)

        eps = eps_fn(x, t)                                      # (M,B,...)
        sigma_t = schedule.sqrt_one_minus_alpha_bars[t_scalar]
        scores = -eps / sigma_t

        beta = schedule.betas[t_scalar]
        sqrt_recip_alpha = schedule.sqrt_recip_alphas[t_scalar]
        noise = jax.random.normal(nkey, shape, dtype=dtype)
        keep = (t_scalar > 0).astype(dtype)
        # DDPM mean in score form: (x + beta * s_mix) / sqrt(alpha)
        # dx = dx_base + <mixing of scores>; affine pieces for AND mode.
        noise_term = jnp.sqrt(beta) * keep * noise
        dx_base_nos = sqrt_recip_alpha * x - x + noise_term  # score-free part

        if mode == "and":
            # dx(kappa) = dx_base + kappa * dx_coef, with s_mix =
            # kappa s1 + (1-kappa) s2:
            dx_base = dx_base_nos + sqrt_recip_alpha * beta * scores[1]
            dx_coef = sqrt_recip_alpha * beta * (scores[0] - scores[1])
            kap = _mix_kappa_and(schedule, t_scalar, x, scores,
                                 dx_base, dx_coef, bias_arr,
                                 logq)                         # (2, B)
        elif mode == "or":
            kap = _mix_kappa_or(logq, temperature, bias_arr)   # (M, B)
        else:
            kap = jnp.tile(kappa_fixed, (1, B))                # (M, B)

        kap_b = kap.astype(dtype).reshape((M, B) + (1,) * (x.ndim - 1))
        s_mix = jnp.sum(kap_b * scores, axis=0)
        dx = dx_base_nos + sqrt_recip_alpha * beta * s_mix
        logq = logq + ito_logdensity_step(schedule, t_scalar, x, scores, dx)
        x_next = x + dx
        if recording:
            frames = record(frames, x_next, pos)
        return (x_next, key, logq, frames), None

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)
    (x_final, _, logq_final, frames), _ = jax.lax.scan(
        step, (x_init, rng, logq_init, frames0), (pos, ts))
    if not recording:
        return x_final, logq_final
    return x_final, logq_final, frames
