"""Compiled reverse-diffusion samplers: DDPM ancestral and DDIM.

The reference's sampler is a 1000-iteration *Python* loop with per-step
host->device transfers of schedule scalars (``src/models/ddpm.py:31-45``) and
its standalone sampling module is an empty file (``src/sampling.py``, 0 bytes).
Here each sampler is a single ``lax.scan`` whose carry is ``(x, rng)`` — the
whole reverse trajectory compiles to one XLA program; the schedule lives in
device memory; noise is drawn on-device by folding the PRNG key per step.

DDIM (Song et al. 2021, arXiv:2010.02502) with arbitrary step counts and
``eta`` covers the reference's declared-but-missing accelerated sampling
(driver BASELINE configs: 50/100-step eta=0 at 128x128).

Both samplers accept an optional classifier-free guidance scale for
conditional models; the uncond/cond batch is stacked so one model call feeds
the MXU with a 2B batch rather than two B calls.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from superdiff_tpu.diffusion.schedules import DiffusionSchedule
from superdiff_tpu.diffusion.process import ModelFn, _bcast_to


def _scan_unroll() -> int:
    """Unroll factor for the sampler scans (SUPERDIFF_TPU_SCAN_UNROLL).
    Unrolling amortizes per-iteration scan overhead across two denoiser
    calls; measured on v5e (scripts/bench_r3_tuning.py): eff256 8.671 ->
    8.633 ms/step, attn256d 10.23 -> 10.12, at the cost of ~2x scan-body
    compile time. Default 2 (T=1000/100/50 all divide; non-divisible step
    counts silently fall back to 1)."""
    unroll = int(os.environ.get("SUPERDIFF_TPU_SCAN_UNROLL", "2"))
    if unroll < 1:
        raise ValueError("SUPERDIFF_TPU_SCAN_UNROLL must be >= 1, got "
                         f"{unroll}")
    return unroll


def _guided_eps(model_fn: ModelFn,
                x: jnp.ndarray,
                t: jnp.ndarray,
                y: Optional[jnp.ndarray],
                guidance_scale: float,
                null_label: int) -> jnp.ndarray:
    """Epsilon prediction with optional classifier-free guidance.

    With guidance, runs cond+uncond in one stacked call (batch 2B — bigger
    matmuls for the MXU, one weight read from HBM instead of two).
    """
    if y is None:
        return model_fn(x, t)
    if guidance_scale == 1.0:
        return model_fn(x, t, y)
    x2 = jnp.concatenate([x, x], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    y_null = jnp.full_like(y, null_label)
    y2 = jnp.concatenate([y, y_null], axis=0)
    eps2 = model_fn(x2, t2, y2)
    eps_c, eps_u = jnp.split(eps2, 2, axis=0)
    return eps_u + guidance_scale * (eps_c - eps_u)


def make_frame_recorder(total_steps: int, num_frames: int):
    """Constant-memory trajectory recording inside a sampler scan.

    Returns ``(init_buffer_fn, record_fn)``; ``record_fn(buf, x, pos)``
    writes ``x`` into the ``(num_frames, ...)`` buffer at ``num_frames``
    evenly spaced scan positions, always including the final step — the
    reverse-trajectory strip the reference mislabels
    (``src/utils/visualization.py:6-15``). O(num_frames) memory instead of
    materializing every step's state (T x B x H x W stacking is GBs at
    256²/T=1000).

    ``num_frames`` is clamped to ``total_steps`` (a scan step writes at
    most one slot, so more frames than steps would leave the leading slots
    as their all-zeros init — black panels in the rendered strip).
    """
    num_frames = min(num_frames, total_steps)
    every = max(1, total_steps // num_frames)

    def init(shape, dtype):
        return jnp.zeros((num_frames,) + tuple(shape), dtype=dtype)

    def record(buf, x, pos):
        remaining = (total_steps - 1) - pos
        idx = (num_frames - 1) - remaining // every
        do = jnp.logical_and(remaining % every == 0, idx >= 0)
        return jax.lax.cond(
            do,
            lambda b: jax.lax.dynamic_update_index_in_dim(
                b, x, jnp.maximum(idx, 0), 0),
            lambda b: b,
            buf)

    return init, record


def ddpm_step(schedule: DiffusionSchedule,
              x: jnp.ndarray,
              t: jnp.ndarray,
              eps_hat: jnp.ndarray,
              noise: jnp.ndarray) -> jnp.ndarray:
    """One ancestral update, exactly the reference's formula
    (``src/models/ddpm.py:42-44``):

    ``x' = (1/sqrt(a_t)) (x - ((1-a_t)/sqrt(1-ab_t)) eps_hat) + sqrt(b_t) z``
    with ``z = 0`` at ``t == 0``.
    """
    coef = _bcast_to(
        (1.0 - schedule.alphas[t]) / schedule.sqrt_one_minus_alpha_bars[t], x)
    mean = _bcast_to(schedule.sqrt_recip_alphas[t], x) * (x - coef * eps_hat)
    sigma = _bcast_to(jnp.sqrt(schedule.betas[t]), x)
    keep_noise = _bcast_to((t > 0).astype(x.dtype), x)
    return mean + sigma * keep_noise * noise


def ddpm_sample(schedule: DiffusionSchedule,
                model_fn: ModelFn,
                shape: Tuple[int, ...],
                rng: jax.Array,
                y: Optional[jnp.ndarray] = None,
                guidance_scale: float = 1.0,
                null_label: int = 0,
                num_frames: int = 0,
                dtype=jnp.float32):
    """Full T-step ancestral sampling as one ``lax.scan``.

    Returns ``x0`` of ``shape`` (NHWC), or ``(x0, frames)`` when
    ``num_frames > 0`` — frames are ``num_frames`` evenly spaced intermediate
    states (the reverse-trajectory strip the reference's
    ``plot_reverse_diffusion`` mislabels, ``src/utils/visualization.py:6-15``).
    """
    T = schedule.num_timesteps
    rng, init_rng = jax.random.split(rng)
    x_init = jax.random.normal(init_rng, shape, dtype=dtype)

    recording = num_frames > 0
    if recording:
        init_buf, record = make_frame_recorder(T, num_frames)
        frames0 = init_buf(shape, dtype)
    else:
        frames0 = jnp.zeros((0,))

    def step(carry, scan_in):
        x, key, frames = carry
        pos, t_scalar = scan_in
        key, nkey = jax.random.split(key)
        t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
        eps_hat = _guided_eps(model_fn, x, t, y, guidance_scale, null_label)
        noise = jax.random.normal(nkey, shape, dtype=dtype)
        x_next = ddpm_step(schedule, x, t, eps_hat, noise)
        if recording:
            frames = record(frames, x_next, pos)
        return (x_next, key, frames), None

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)
    (x_final, _, frames), _ = jax.lax.scan(
        step, (x_init, rng, frames0), (pos, ts),
        unroll=_scan_unroll() if T % _scan_unroll() == 0 else 1)
    if not recording:
        return x_final
    return x_final, frames


def ddim_timesteps(T: int, num_steps: int) -> np.ndarray:
    """Evenly spaced sub-sequence of timesteps, descending, ending at 0."""
    if num_steps >= T:
        return np.arange(T - 1, -1, -1)
    step = T // num_steps
    ts = np.arange(0, T, step)[:num_steps]
    return ts[::-1].copy()


def trailing_timesteps(T: int, num_steps: int) -> np.ndarray:
    """Descending sampler grid with node_0 = T-1 exactly:
    ``t_k = (k+1) * T // num_steps - 1``.

    The leading grid (:func:`ddim_timesteps`) starts at ``T - T//num_steps``
    — fine at 50+ steps, but at 1-4 steps the ``x ~ N(0, I)`` init is then
    badly mismatched with ``alpha_bar[t_0]`` (a 1-step leading grid would
    "start" at t=0). Trailing grids start at the highest timestep, and
    halving grids nest exactly (``trailing(T, N) == trailing(T, 2N)[::2]``)
    — the property progressive distillation's phases rely on
    (``diffusion/distill.py``, arXiv:2202.00512).
    """
    if not 1 <= num_steps <= T:
        raise ValueError(f"num_steps must be in [1, {T}], got {num_steps}")
    k = np.arange(num_steps, 0, -1, dtype=np.int64)
    return (k * T // num_steps - 1).astype(np.int64)


def ddim_sample(schedule: DiffusionSchedule,
                model_fn: ModelFn,
                shape: Tuple[int, ...],
                rng: jax.Array,
                num_steps: int = 50,
                eta: float = 0.0,
                y: Optional[jnp.ndarray] = None,
                guidance_scale: float = 1.0,
                null_label: int = 0,
                clip_x0: bool = True,
                num_frames: int = 0,
                t_spacing: str = "leading",
                dtype=jnp.float32) -> jnp.ndarray:
    """DDIM sampling (arXiv:2010.02502 eq. 12) over ``num_steps`` steps.

    ``eta = 0`` is fully deterministic given the init noise; ``eta = 1``
    recovers DDPM-like stochasticity on the sub-sequence. Missing from the
    reference (empty ``src/sampling.py``); required by the north-star configs.

    ``clip_x0`` clamps the predicted clean image to [-1, 1] each step
    (standard "clip_denoised"); data is normalized into that range by the
    pipeline, and clipping keeps early large-t extrapolations bounded.

    ``num_frames > 0`` additionally returns evenly spaced intermediate
    states (same contract as :func:`ddpm_sample`) so reverse strips and
    compare panels work on the fast sampling path too.

    ``t_spacing="trailing"`` starts the grid at t = T-1 exactly
    (:func:`trailing_timesteps`) — REQUIRED when sampling progressively
    distilled students (their phases train on trailing grids), and the
    better-conditioned choice for any run under ~8 steps.
    """
    if t_spacing == "leading":
        ts_np = ddim_timesteps(schedule.num_timesteps, num_steps)
    elif t_spacing == "trailing":
        ts_np = trailing_timesteps(schedule.num_timesteps, num_steps)
    else:
        raise ValueError(f"unknown t_spacing: {t_spacing!r}")
    ts = jnp.asarray(ts_np, dtype=jnp.int32)
    # alpha_bar of the *next* (less noisy) step in the subsequence; 1.0 at end.
    ab_next_np = np.concatenate([
        np.asarray(schedule.alpha_bars)[ts_np[1:]], [1.0]]).astype(np.float32)
    ab_next_seq = jnp.asarray(ab_next_np)

    rng, init_rng = jax.random.split(rng)
    x_init = jax.random.normal(init_rng, shape, dtype=dtype)

    recording = num_frames > 0
    if recording:
        init_buf, record = make_frame_recorder(len(ts_np), num_frames)
        frames0 = init_buf(shape, dtype)
    else:
        frames0 = jnp.zeros((0,))

    def step(carry, scan_in):
        x, key, frames = carry
        pos, t_scalar, ab_next = scan_in
        key, nkey = jax.random.split(key)
        t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
        eps_hat = _guided_eps(model_fn, x, t, y, guidance_scale, null_label)

        ab_t = schedule.alpha_bars[t_scalar]
        x0_pred = (x - jnp.sqrt(1.0 - ab_t) * eps_hat) / jnp.sqrt(ab_t)
        if clip_x0:
            x0_pred = jnp.clip(x0_pred, -1.0, 1.0)
            # re-derive eps consistent with the clipped x0 so the
            # "direction" term stays on-manifold
            eps_hat = (x - jnp.sqrt(ab_t) * x0_pred) / jnp.sqrt(1.0 - ab_t)
        sigma = (eta * jnp.sqrt((1.0 - ab_next) / (1.0 - ab_t))
                 * jnp.sqrt(1.0 - ab_t / ab_next))
        dir_coef = jnp.sqrt(jnp.maximum(1.0 - ab_next - sigma ** 2, 0.0))
        noise = jax.random.normal(nkey, shape, dtype=dtype)
        # No fresh noise on the final step (ab_next == 1 -> sigma == 0 anyway
        # for eta<=1, but guard explicitly for eta>1 experimentation).
        noise = jnp.where(ab_next >= 1.0, 0.0, noise)
        x_next = (jnp.sqrt(ab_next) * x0_pred + dir_coef * eps_hat
                  + sigma * noise)
        if recording:
            frames = record(frames, x_next, pos)
        return (x_next, key, frames), None

    pos = jnp.arange(len(ts_np), dtype=jnp.int32)
    n = len(ts_np)
    (x_final, _, frames), _ = jax.lax.scan(
        step, (x_init, rng, frames0), (pos, ts, ab_next_seq),
        unroll=_scan_unroll() if n % _scan_unroll() == 0 else 1)
    if not recording:
        return x_final
    return x_final, frames


def dpmpp_timesteps(T: int, num_steps: int, alpha_bars,
                    spacing: str = "logsnr") -> np.ndarray:
    """Node sub-sequence for the ODE solver, descending, ending at 0.

    ``logsnr`` places nodes uniformly in ``lambda = 0.5 log(ab/(1-ab))`` —
    where the solver's local error actually lives — instead of uniformly in
    t. Measured on the analytic Gaussian ODE (tests/test_samplers.py):
    10-step RMSE 0.290 (uniform-t) -> 0.080 (logsnr), 20-step 0.072 ->
    0.030; i.e. logsnr-10 matches uniform-20. Snapping to the discrete grid
    can merge neighbors, so the result may be shorter than ``num_steps``.
    """
    if spacing == "uniform":
        return ddim_timesteps(T, num_steps)
    if spacing != "logsnr":
        raise ValueError(f"unknown t_spacing: {spacing!r}")
    ab = np.asarray(alpha_bars, dtype=np.float64)[:T]
    lam = 0.5 * np.log(ab / (1.0 - ab))
    targets = np.linspace(lam[T - 1], lam[0], num_steps)
    idx = np.abs(lam[None, :] - targets[:, None]).argmin(axis=1)
    return np.unique(idx)[::-1].copy()


def dpmpp_sample(schedule: DiffusionSchedule,
                 model_fn: ModelFn,
                 shape: Tuple[int, ...],
                 rng: jax.Array,
                 num_steps: int = 20,
                 y: Optional[jnp.ndarray] = None,
                 guidance_scale: float = 1.0,
                 null_label: int = 0,
                 clip_x0: bool = True,
                 num_frames: int = 0,
                 t_spacing: str = "logsnr",
                 dtype=jnp.float32) -> jnp.ndarray:
    """DPM-Solver++(2M) — second-order multistep ODE sampling
    (Lu et al. 2022, arXiv:2211.01095, data-prediction variant).

    The fast-sampling frontier beyond DDIM: one model call per step plus a
    free second-order correction from the *previous* step's x0 prediction,
    so ~20 steps match what DDIM needs ~50 for. Goes beyond the reference's
    declared-but-empty sampling module (``src/sampling.py``, 0 bytes) the
    same way :func:`ddim_sample` does, one rung higher on the speed/quality
    curve. Deterministic given the init noise (ODE solver, no fresh noise).

    Update in log-SNR time (``lambda_t = log(alpha_t / sigma_t)`` with
    ``alpha = sqrt(alpha_bar)``, ``sigma = sqrt(1 - alpha_bar)``), stepping
    node ``s -> t`` with ``h = lambda_t - lambda_s``:

    ``x_t = (sigma_t / sigma_s) x_s + alpha_t (1 - e^{-h}) D``

    where ``D`` extrapolates the current and previous x0 predictions,
    ``D = (1 + c) x0_i - c x0_{i-1}`` with ``c = h_i / (2 h_{i-1})``
    (first-order on the first step). The final transition targets the clean
    manifold (``sigma = 0``) first-order — the standard ``lower_order_final``
    stabilization for <15-step runs — so the last update returns the t=0
    x0 prediction exactly. Model calls: at most ``num_steps``
    (:func:`dpmpp_timesteps` may merge neighboring grid nodes).

    ``t_spacing="logsnr"`` (default) spaces nodes uniformly in log-SNR —
    measured 2.4-3.6x lower ODE error than uniform-t at 10-20 steps
    (:func:`dpmpp_timesteps`).
    """
    ts_np = dpmpp_timesteps(schedule.num_timesteps, num_steps,
                            schedule.alpha_bars, t_spacing)
    n = len(ts_np)
    ab = np.asarray(schedule.alpha_bars, dtype=np.float64)[ts_np]
    alpha = np.sqrt(ab)
    sigma = np.sqrt(1.0 - ab)
    lam = np.log(alpha / sigma)

    # Per-transition target coefficients: node i -> node i+1 for i<n-1,
    # node n-1 -> the clean manifold (sigma=0, alpha=1, e^{-h}=0) for the
    # last. h_last is +inf in the math; the closed-form limits below avoid
    # materializing it.
    coef_x = np.concatenate([sigma[1:] / sigma[:-1], [0.0]])
    exp_mh = np.concatenate([np.exp(-(lam[1:] - lam[:-1])), [0.0]])
    coef_d = np.concatenate([alpha[1:], [1.0]]) * (1.0 - exp_mh)
    h = lam[1:] - lam[:-1]                       # finite transitions only
    # Second-order mixing c_i = h_i / (2 h_{i-1}): zero on the first step
    # (no history) and the last (h=inf would blow it up — lower_order_final).
    c2 = np.zeros(n)
    if n >= 3:
        c2[1:n - 1] = h[1:] / (2.0 * h[:-1])

    ts = jnp.asarray(ts_np, dtype=jnp.int32)
    ab_seq = jnp.asarray(ab, dtype=jnp.float32)
    coef_x = jnp.asarray(coef_x, dtype=jnp.float32)
    coef_d = jnp.asarray(coef_d, dtype=jnp.float32)
    c2 = jnp.asarray(c2, dtype=jnp.float32)

    rng, init_rng = jax.random.split(rng)
    x_init = jax.random.normal(init_rng, shape, dtype=dtype)

    recording = num_frames > 0
    if recording:
        init_buf, record = make_frame_recorder(n, num_frames)
        frames0 = init_buf(shape, dtype)
    else:
        frames0 = jnp.zeros((0,))

    def step(carry, scan_in):
        x, x0_prev, frames = carry
        pos, t_scalar, ab_t, cx, cd, c = scan_in
        t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
        eps_hat = _guided_eps(model_fn, x, t, y, guidance_scale, null_label)
        a_t = jnp.sqrt(ab_t)
        s_t = jnp.sqrt(1.0 - ab_t)
        x0_pred = (x - s_t * eps_hat) / a_t
        if clip_x0:
            x0_pred = jnp.clip(x0_pred, -1.0, 1.0)
        d = (1.0 + c) * x0_pred - c * x0_prev
        x_next = cx * x + cd * d
        if recording:
            frames = record(frames, x_next, pos)
        return (x_next, x0_pred, frames), None

    pos = jnp.arange(n, dtype=jnp.int32)
    (x_final, _, frames), _ = jax.lax.scan(
        step, (x_init, jnp.zeros(shape, dtype=dtype), frames0),
        (pos, ts, ab_seq, coef_x, coef_d, c2),
        unroll=_scan_unroll() if n % _scan_unroll() == 0 else 1)
    if not recording:
        return x_final
    return x_final, frames
