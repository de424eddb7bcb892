"""Training state pytree: params, EMA params, optimizer state, step, RNG.

The reference keeps these scattered across objects (model, ema-pytorch
wrapper, torch Adam — ``src/train/training_logic.py:15-16``) and its
checkpoints save only raw/EMA ``state_dict``s, so resume is impossible
(SURVEY.md §5.4). Here the *whole* training state is one pytree: jittable,
donatable, shardable, and checkpointable as a unit (optimizer state, step
and PRNG key included — resume is bit-exact).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray                 # scalar int32
    params: Any                       # model params pytree (fp32)
    ema_params: Any                   # EMA shadow of params (fp32)
    opt_state: Any                    # optax state
    rng: jax.Array                    # PRNG key folded per step

    # static (non-pytree) fields
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_decay: float = struct.field(pytree_node=False, default=0.995)


def make_optimizer(learning_rate: float = 2e-4,
                   weight_decay: float = 0.0,
                   grad_clip_norm: Optional[float] = None,
                   warmup_steps: int = 0,
                   total_steps: Optional[int] = None,
                   schedule: str = "constant") -> optax.GradientTransformation:
    """Adam(lr=2e-4) matches the reference (``training_logic.py:15``);
    clip/warmup/cosine-decay/adamw are capability extensions."""
    if schedule == "constant":
        lr = optax.schedules.constant_schedule(learning_rate)
    elif schedule == "cosine":
        if total_steps is None:
            raise ValueError("cosine schedule requires total_steps")
        # optax requires decay_steps = total - warmup > 0; clamp warmup to
        # total-1 so one-step smoke runs construct (warmup 0 is valid)
        warm = min(max(warmup_steps, 1), max(total_steps - 1, 0))
        lr = optax.schedules.warmup_cosine_decay_schedule(
            0.0, learning_rate, warm, total_steps)
    else:
        raise ValueError(f"unknown lr schedule: {schedule!r}")
    if schedule == "constant" and warmup_steps > 0:
        lr = optax.schedules.linear_schedule(0.0, learning_rate,
                                             warmup_steps)

    opt = (optax.adamw(lr, weight_decay=weight_decay) if weight_decay > 0
           else optax.adam(lr))
    if grad_clip_norm is not None:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip_norm), opt)
    return opt


def create_train_state(model,
                       rng: jax.Array,
                       sample_input: tuple,
                       tx: Optional[optax.GradientTransformation] = None,
                       ema_decay: float = 0.995) -> TrainState:
    """Initialize params/EMA/optimizer for a Flax model.

    ``sample_input``: args for ``model.init`` after the rng, e.g.
    ``(x, t)`` or ``(x, t, y)``.
    """
    from superdiff_tpu.utils.env import host_init

    init_rng, state_rng = jax.random.split(rng)
    # init compiles on host CPU (seconds) instead of the accelerator
    # (minutes on remote backends); params transfer once.
    params = host_init(model.init, init_rng, *sample_input)
    tx = tx if tx is not None else make_optimizer()
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=tx.init(params),
        rng=state_rng,
        apply_fn=model.apply,
        tx=tx,
        ema_decay=ema_decay,
    )


def ema_update(ema_params, new_params, decay: float, step: jnp.ndarray):
    """EMA with ema-pytorch-style warmup: effective decay ramps in as
    ``min(decay, (1+step)/(10+step))`` so early steps track the raw params
    (the reference's EMA wrapper defaults, beta=0.995 per
    ``training_logic.py:16``)."""
    eff = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    return jax.tree_util.tree_map(
        lambda e, p: eff * e + (1.0 - eff) * p, ema_params, new_params)
