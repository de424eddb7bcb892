"""Progressive distillation: halve sampler steps, keep quality.

Salimans & Ho 2022 (arXiv:2202.00512): a *student* denoiser is trained so
that ONE of its DDIM steps reproduces TWO consecutive DDIM steps of a
frozen *teacher*; repeating the procedure halves the sampler length each
phase (e.g. 32 -> 16 -> 8 -> 4 -> 2 -> 1 model calls). The reference has
no fast-sampling path at all (its sampler is the fixed 1000-step Python
loop, ``src/models/ddpm.py:31-45``, and ``src/sampling.py`` is an empty
file); this module extends the framework's DDIM/DPM++ fast-sampling
frontier down to single-call generation.

TPU shape: the whole distillation step — teacher two-step rollout, target
solve, student loss, Adam, EMA — is ONE jitted program (donated student
state); the per-example phase grids are gathered from precomputed device
tables, so every batch element trains a different transition of the same
compiled step. Grids are **trailing-spaced** (first node exactly T-1) so
the x ~ N(0, I) initialization matches ab_{T-1} even at 1-2 steps; the
doubling phases nest node-exactly (student node k = teacher node 2k).

The student's head should use the ``v`` parameterization
(``model.parameterization``; arXiv:2202.00512 §2.4): eps heads lose all
x0 information at the pure-noise node a 1-2 step sampler starts from.
The loss is the paper's truncated-SNR-weighted x0-MSE, which is
parameterization-independent (the head output is converted to x0 first).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from superdiff_tpu.diffusion.schedules import DiffusionSchedule
from superdiff_tpu.diffusion.process import _bcast_to, x0_from_pred
from superdiff_tpu.diffusion.samplers import trailing_timesteps
from superdiff_tpu.training.state import TrainState, ema_update


def _alpha_sigma(schedule: DiffusionSchedule, t: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray]:
    ab = np.asarray(schedule.alpha_bars, dtype=np.float64)[t]
    return np.sqrt(ab), np.sqrt(1.0 - ab)


def phase_tables(schedule: DiffusionSchedule, num_student_steps: int):
    """Per-transition constants for one distillation phase, as host arrays.

    Returns a dict of ``(N,)`` arrays indexed by the student transition
    ``i``: the student start node ``t_s`` with its (alpha, sigma), the
    teacher midpoint node ``t_m`` with (alpha, sigma), and the endpoint
    (alpha, sigma) — where the endpoint of the LAST transition is the
    clean manifold (alpha=1, sigma=0), matching how
    :func:`~superdiff_tpu.diffusion.samplers.ddim_sample` treats its final
    step (``ab_next = 1``).
    """
    N = num_student_steps
    teacher = trailing_timesteps(schedule.num_timesteps, 2 * N)
    t_s = teacher[0::2]                  # student start nodes (N,)
    t_m = teacher[1::2]                  # teacher midpoints   (N,)
    a_s, s_s = _alpha_sigma(schedule, t_s)
    a_m, s_m = _alpha_sigma(schedule, t_m)
    # endpoint of transition i is the start node of transition i+1;
    # the last endpoint is clean (alpha=1, sigma=0)
    a_e = np.concatenate([a_s[1:], [1.0]])
    s_e = np.concatenate([s_s[1:], [0.0]])
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return {
        "t_s": jnp.asarray(t_s, dtype=jnp.int32),
        "t_m": jnp.asarray(t_m, dtype=jnp.int32),
        "a_s": f32(a_s), "s_s": f32(s_s),
        "a_m": f32(a_m), "s_m": f32(s_m),
        "a_e": f32(a_e), "s_e": f32(s_e),
    }


def _ddim_to(x, a_from, s_from, a_to, s_to, eps, clip_x0=True):
    """One deterministic DDIM (eta=0) transition given the eps prediction:
    ``x0 = (x - s_f eps) / a_f``; ``x' = a_to x0 + s_to eps``.

    ``clip_x0`` mirrors :func:`~superdiff_tpu.diffusion.samplers.ddim_sample`
    (clamp the x0 estimate to [-1, 1] and re-derive a consistent eps) so the
    teacher trajectory being distilled IS the trajectory the teacher's own
    sampler produces — without it, the distillation target and the "teacher
    baseline" FID row are two different teachers at the high-noise nodes."""
    x0 = (x - s_from * eps) / a_from
    if clip_x0:
        x0 = jnp.clip(x0, -1.0, 1.0)
        eps = (x - a_from * x0) / jnp.maximum(s_from, 1e-12)
    return a_to * x0 + s_to * eps


def distill_targets(x_s, a_s, s_s, a_e, s_e, x_pp):
    """Solve the x0 the student must predict so ONE DDIM step from
    ``(x_s, a_s, s_s)`` to ``(a_e, s_e)`` lands exactly on the teacher's
    two-step result ``x_pp`` (arXiv:2202.00512, Algorithm 2):

    ``x_pp = a_e x0 + s_e (x_s - a_s x0) / s_s``  solved for x0 gives
    ``x0 = (x_pp - (s_e / s_s) x_s) / (a_e - s_e a_s / s_s)``.

    The denominator is ``(a_e s_s - s_e a_s) / s_s`` — positive whenever
    the endpoint is strictly less noisy than the start. For the clean
    endpoint (``s_e = 0``) it degrades gracefully to ``x_pp / a_e = x_pp``.
    """
    denom = a_e - s_e * a_s / s_s
    return (x_pp - (s_e / s_s) * x_s) / denom


def make_distill_step(schedule: DiffusionSchedule,
                      teacher_eps_fn: Callable,
                      num_student_steps: int,
                      mesh: Optional[Mesh] = None,
                      conditional: bool = False,
                      parameterization: str = "v",
                      null_prob: float = 0.0,
                      null_label: int = 0,
                      normalization: str = "tanh",
                      clip_x0: bool = True) -> Callable:
    """Build the jitted distillation step for one phase.

    ``teacher_eps_fn(teacher_params, x, t[, y]) -> eps`` is the frozen
    teacher in sampler form (:func:`superdiff_tpu.inference.make_eps_fn_p`
    with the teacher's own schedule/parameterization baked in).
    ``parameterization`` is the STUDENT head's (``state.apply_fn``'s
    model); the loss converts it to x0, so any of eps/v/x0 works — use
    ``v`` below ~8 steps (eps heads carry no x0 signal at the pure-noise
    node).

    Returns ``step_fn(state, teacher_params, batch) -> (state, metrics)``.
    ``batch["image"]`` may be raw uint8 (normalized inside the jit, same
    fused pipeline as ``make_train_step``; distillation uses NO
    augmentation — targets are teacher rollouts, not data labels).

    ``null_prob``: probability of replacing each label with ``null_label``
    — the SAME replaced label feeds teacher and student, so a conditional
    student also distills the teacher's unconditional path (which is what
    null-label FID protocols sample).

    ``clip_x0`` (default True) makes the teacher rollout use the exact
    clipped-DDIM transition the samplers default to, so the distillation
    target is the same teacher the baseline FID rows evaluate; disable
    only for analytic tests on unbounded data.
    """
    tab = phase_tables(schedule, num_student_steps)
    N = num_student_steps

    def loss_of(params, state, teacher_params, batch, rng):
        x0 = batch["image"]
        if x0.dtype == jnp.uint8:
            from superdiff_tpu.data.transforms import prepare_batch
            x0 = prepare_batch(x0, None, augmentation="none",
                               normalization=normalization)
        B = x0.shape[0]
        y = batch["label"] if conditional else None
        if conditional and null_prob > 0.0:
            rng, drop_rng = jax.random.split(rng)
            drop = jax.random.bernoulli(drop_rng, null_prob, (B,))
            y = jnp.where(drop, null_label, y)
        rng_i, rng_noise = jax.random.split(rng)
        i = jax.random.randint(rng_i, (B,), 0, N)
        a_s = _bcast_to(tab["a_s"][i], x0)
        s_s = _bcast_to(tab["s_s"][i], x0)
        a_m = _bcast_to(tab["a_m"][i], x0)
        s_m = _bcast_to(tab["s_m"][i], x0)
        a_e = _bcast_to(tab["a_e"][i], x0)
        s_e = _bcast_to(tab["s_e"][i], x0)
        t_s = tab["t_s"][i]
        t_m = tab["t_m"][i]

        noise = jax.random.normal(rng_noise, x0.shape, dtype=x0.dtype)
        x_s = a_s * x0 + s_s * noise

        # frozen teacher: two DDIM transitions, no gradient flow
        targs = (x_s, t_s) if y is None else (x_s, t_s, y)
        eps1 = jax.lax.stop_gradient(teacher_eps_fn(teacher_params, *targs))
        x_m = _ddim_to(x_s, a_s, s_s, a_m, s_m, eps1, clip_x0=clip_x0)
        margs = (x_m, t_m) if y is None else (x_m, t_m, y)
        eps2 = jax.lax.stop_gradient(teacher_eps_fn(teacher_params, *margs))
        x_pp = _ddim_to(x_m, a_m, s_m, a_e, s_e, eps2, clip_x0=clip_x0)

        x0_target = jax.lax.stop_gradient(
            distill_targets(x_s, a_s, s_s, a_e, s_e, x_pp))

        sargs = (x_s, t_s) if y is None else (x_s, t_s, y)
        pred = state.apply_fn(params, *sargs)
        x0_student = x0_from_pred(schedule, x_s, t_s, pred,
                                  parameterization)

        # truncated-SNR weighting max(SNR, 1) on x0-MSE (paper §3 "SNR+1"
        # family; this is their recommended w(t) = max(ab/(1-ab), 1))
        snr = (a_s[:, 0, 0, 0] ** 2) / (s_s[:, 0, 0, 0] ** 2)
        w = jnp.maximum(snr, 1.0)
        diff = (x0_student.astype(jnp.float32)
                - x0_target.astype(jnp.float32))
        per_sample = jnp.mean(diff.reshape(B, -1) ** 2, axis=1)
        return jnp.mean(w * per_sample)

    def step_fn(state: TrainState, teacher_params, batch):
        rng, step_rng = jax.random.split(state.rng)
        step_rng = jax.random.fold_in(step_rng, state.step)
        loss, grads = jax.value_and_grad(loss_of)(
            state.params, state, teacher_params, batch, step_rng)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: (p + u).astype(p.dtype), state.params, updates)
        ema_params = ema_update(state.ema_params, params, state.ema_decay,
                                state.step)
        grad_norm = jnp.sqrt(sum(
            jnp.sum(jnp.square(g.astype(jnp.float32)))
            for g in jax.tree_util.tree_leaves(grads)))
        new_state = state.replace(step=state.step + 1, params=params,
                                  ema_params=ema_params,
                                  opt_state=opt_state, rng=rng)
        return new_state, {"loss": loss, "grad_norm": grad_norm}

    if mesh is None or mesh.devices.size == 1:
        return jax.jit(step_fn, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    batch_shardings = {"image": data}
    if conditional:
        batch_shardings["label"] = data
    return jax.jit(step_fn,
                   in_shardings=(repl, repl, batch_shardings),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,))
