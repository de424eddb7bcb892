"""Ensemble parallelism for SuperDiff: one model per ``model``-axis slice.

The superposition sampler (``diffusion/superdiff.py``) needs M denoiser
evaluations per reverse step. Single-chip, the M calls run sequentially
(measured faster than the vmap-over-params stacked call, whose M-kernel
batched convs fall off XLA's fast conv path — ``stack_eps_fns`` docstring);
so 2-model SuperDiff costs ~2× a single-model step (0.841 vs 1.689
samples/sec on the flagship, BASELINE.md). This module removes that
latency multiplier on a multi-chip mesh: shard the *models* over the
``model`` axis so each slice computes its own denoiser **concurrently** —
per device it is a plain single-model UNet apply (the fast conv path),
and the only collective is the implicit gather of the tiny per-model eps
stack that the mixing math consumes, inserted by GSPMD.

Idiomatic TPU shape: params for model m live only on slice m (a leading
stacked axis sharded ``P(model)``), a ``shard_map`` runs the per-slice
apply, and the superposition algebra (softmax/kappa mixing, Itô density
accumulation — all O(M·B) scalars plus one (B,H,W,C) mix) stays in plain
jit where the partitioner handles the model-axis reduction. Composes with
data parallelism: the batch stays sharded over ``data`` inside the same
shard_map.

Expected effect (2 models on a (data, model=2) mesh): superposed sampling
at single-model latency — the two UNets run in parallel instead of
back-to-back. Validated for exactness on the virtual 8-device CPU mesh
(tests/test_ep.py): samples AND Itô log-densities match the sequential
single-device path bit-for-tolerance, OR and AND modes.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from superdiff_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def stack_and_shard_params(params_list: Sequence, mesh: Mesh,
                           model_axis: str = MODEL_AXIS):
    """Stack M congruent param pytrees on a leading axis and place each
    model's slice on its own ``model``-axis shard (one transfer)."""
    stacked = jax.tree_util.tree_map(lambda *ps: jnp.stack(ps), *params_list)
    return jax.device_put(stacked, NamedSharding(mesh, P(model_axis)))


def make_ep_eps_fn(apply_fn: Callable, params_list: Sequence, mesh: Mesh,
                   y=None,
                   data_axis: str = DATA_AXIS,
                   model_axis: str = MODEL_AXIS) -> Callable:
    """Build ``eps_fn(x, t) -> (M, B, ...)`` with model m evaluated on
    mesh slice m.

    ``apply_fn(params, x, t) -> eps``, or ``apply_fn(params, x, t, y) ->
    eps`` when ``y`` (a per-example ``(B,)`` label array) is given — labels
    must ride through the shard_map as a data-sharded argument, NOT a
    closure (a closed-over global-batch ``y`` would collide with the local
    batch shard inside the map). Requires ``len(params_list) ==
    mesh.shape[model_axis]`` — each slice holds exactly one model. Pass
    the result to ``superdiff_sample(..., model_fns=eps_fn,
    num_models=M)``.
    """
    M = len(params_list)
    n_model = mesh.shape[model_axis]
    if M != n_model:
        raise ValueError(
            f"{M} models need mesh {model_axis}={M}, have {n_model}")
    stacked = stack_and_shard_params(params_list, mesh, model_axis)

    def _local(p, x, t, *ys):
        # one model per slice: strip the length-1 stacked axis and run the
        # plain (fast-conv-path) apply on the local batch shard
        p1 = jax.tree_util.tree_map(lambda a: a[0], p)
        return apply_fn(p1, x, t, *ys)[None]

    n_y = 0 if y is None else 1
    sharded_apply = shard_map(
        _local, mesh=mesh,
        in_specs=(P(model_axis),) + (P(data_axis),) * (2 + n_y),
        out_specs=P(model_axis, data_axis))

    def eps_fn(x, t):
        args = (x, t) if y is None else (x, t, y)
        return sharded_apply(stacked, *args)

    return eps_fn
