"""Jitted, mesh-sharded train/eval steps.

One compiled program per step: loss + grads + Adam + EMA, with the batch
sharded over the mesh's data axis and the state replicated. XLA inserts the
gradient all-reduce over ICI — there is no hand-written collective here
(SURVEY.md §2.4: the reference is single-device; this is the TPU-native DP
path the north star mandates).

The state is donated: parameters and optimizer state are updated in place in
HBM rather than double-buffered.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from superdiff_tpu.diffusion.schedules import DiffusionSchedule
from superdiff_tpu.diffusion.process import training_step as loss_fn_impl
from superdiff_tpu.training.state import TrainState, ema_update


def make_train_step(schedule: DiffusionSchedule,
                    mesh: Optional[Mesh] = None,
                    conditional: bool = False,
                    cfg_drop_prob: float = 0.0,
                    null_label: int = 0,
                    loss_type: str = "mse",
                    weighting: str = "none",
                    min_snr_gamma: float = 5.0,
                    parameterization: str = "eps",
                    augmentation: str = "none",
                    normalization: str = "tanh",
                    state_shardings=None,
                    grad_accum: int = 1) -> Callable:
    """Build the jitted train step.

    ``cfg_drop_prob``: probability of replacing each label with the null
    label during training — classifier-free guidance training (only
    meaningful when ``conditional``).

    ``augmentation``/``normalization``: when ``batch["image"]`` arrives as
    **uint8**, the stochastic augmentation + normalization pipeline
    (``data/transforms.prepare_batch``) runs INSIDE this compiled step.
    One 1-byte/pixel host->device upload and ONE dispatch per step —
    no per-batch eager transform chain on the host, which over a remote
    TPU tunnel was measured to cap the full pipeline at 176 img/s while
    the step alone runs 463 (BASELINE.md round-3 pipeline table).
    Float batches skip the fused path (they are already prepared), so
    eval/synthetic callers are unaffected.

    ``state_shardings``: optional sharding pytree for the TrainState
    (``parallel.tp.state_shardings``) — enables tensor-parallel execution
    over the mesh's ``model`` axis on top of batch data parallelism; the
    default replicates the state (pure DP, SURVEY.md §2.4's deliverable).

    ``grad_accum``: microbatch count k > 1 splits the batch into k
    sequential grad computations inside ONE compiled step (``lax.scan``
    over microbatches, activations for one microbatch live at a time) and
    applies a single optimizer/EMA update on the averaged gradients —
    effective batch B with the activation memory of B/k. Each microbatch
    draws its own fold of the step RNG, so the k grads are exactly the k
    independent-microbatch grads (parity pinned in test_training.py).
    Requires ``B % k == 0`` (and ``B/k`` still divisible by the mesh's
    data axis for even sharding).

    Returns ``step_fn(state, batch) -> (state, metrics)`` where ``batch`` is
    ``{"image": (B,H,W,C)}`` plus ``{"label": (B,)}`` when conditional.
    """
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

    def loss_of(params, state, batch, rng):
        x = batch["image"]
        if x.dtype == jnp.uint8:
            # fused on-device prep; the aug stream is folded off the step
            # rng so the diffusion-noise stream below is bit-identical to
            # the unfused path (pinned by test_fused_prep_step)
            from superdiff_tpu.data.transforms import prepare_batch
            aug_rng = jax.random.fold_in(rng, 0x5D5D)
            x = prepare_batch(x, aug_rng, augmentation=augmentation,
                              normalization=normalization)
        if conditional:
            y = batch["label"]
            if cfg_drop_prob > 0.0:
                rng, drop_rng = jax.random.split(rng)
                drop = jax.random.bernoulli(drop_rng, cfg_drop_prob,
                                            (x.shape[0],))
                y = jnp.where(drop, null_label, y)
            model_fn = lambda xt, t, yy: state.apply_fn(params, xt, t, yy)
            return loss_fn_impl(schedule, model_fn, x, rng, y=y,
                                loss_type=loss_type, weighting=weighting,
                                min_snr_gamma=min_snr_gamma,
                                parameterization=parameterization)
        model_fn = lambda xt, t: state.apply_fn(params, xt, t)
        return loss_fn_impl(schedule, model_fn, x, rng, loss_type=loss_type,
                            weighting=weighting, min_snr_gamma=min_snr_gamma,
                            parameterization=parameterization)

    def grads_of(state, batch, step_rng):
        if grad_accum == 1:
            return jax.value_and_grad(loss_of)(
                state.params, state, batch, step_rng)
        B = batch["image"].shape[0]
        if B % grad_accum:
            raise ValueError(f"batch size {B} not divisible by "
                             f"grad_accum {grad_accum}")
        micro = jax.tree_util.tree_map(
            lambda a: a.reshape((grad_accum, B // grad_accum) + a.shape[1:]),
            batch)

        def body(carry, inp):
            loss_sum, grad_sum = carry
            i, mb = inp
            mb_rng = jax.random.fold_in(step_rng, i)
            loss, grads = jax.value_and_grad(loss_of)(
                state.params, state, mb, mb_rng)
            grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, grads)
            return (loss_sum + loss, grad_sum), None

        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p), state.params)
        (loss_sum, grad_sum), _ = jax.lax.scan(
            body, (jnp.zeros(()), zeros),
            (jnp.arange(grad_accum), micro))
        inv = 1.0 / grad_accum
        return loss_sum * inv, jax.tree_util.tree_map(
            lambda g: g * inv, grad_sum)

    def step_fn(state: TrainState, batch) -> tuple:
        rng, step_rng = jax.random.split(state.rng)
        step_rng = jax.random.fold_in(step_rng, state.step)
        loss, grads = grads_of(state, batch, step_rng)
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
        # Plain jit on a single device: explicit in/out shardings on a
        # 1-device mesh trigger a per-call reshard of the whole state on
        # remote PJRT backends (measured ~100x slowdown on the axon
        # tunnel) and buy nothing.
        return jax.jit(step_fn, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    batch_shardings = {"image": data}
    if conditional:
        batch_shardings["label"] = data
    state_sh = repl if state_shardings is None else state_shardings
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_shardings),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )


def make_eval_step(schedule: DiffusionSchedule,
                   mesh: Optional[Mesh] = None,
                   conditional: bool = False,
                   loss_type: str = "mse",
                   weighting: str = "none",
                   min_snr_gamma: float = 5.0,
                   parameterization: str = "eps",
                   normalization: str = "tanh") -> Callable:
    """Validation loss on EMA params (no grads, fixed fold-in RNG).

    Like the train step, a **uint8** ``batch["image"]`` is normalized
    INSIDE the jit (never augmented — validation sees clean data), so the
    val pass rides the same one-upload-one-dispatch pipeline as training.
    """

    def eval_fn(state: TrainState, batch) -> jnp.ndarray:
        rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
        x = batch["image"]
        if x.dtype == jnp.uint8:
            from superdiff_tpu.data.transforms import prepare_batch
            x = prepare_batch(x, None, augmentation="none",
                              normalization=normalization)
        if conditional:
            model_fn = lambda xt, t, yy: state.apply_fn(
                state.ema_params, xt, t, yy)
            return loss_fn_impl(schedule, model_fn, x, rng,
                                y=batch["label"], loss_type=loss_type,
                                weighting=weighting,
                                min_snr_gamma=min_snr_gamma,
                                parameterization=parameterization)
        model_fn = lambda xt, t: state.apply_fn(state.ema_params, xt, t)
        return loss_fn_impl(schedule, model_fn, x, rng, loss_type=loss_type,
                            weighting=weighting, min_snr_gamma=min_snr_gamma,
                            parameterization=parameterization)

    if mesh is None or mesh.devices.size == 1:
        return jax.jit(eval_fn)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    batch_shardings = {"image": data}
    if conditional:
        batch_shardings["label"] = data
    return jax.jit(eval_fn, in_shardings=(repl, batch_shardings),
                   out_shardings=repl)
