"""Fully-sharded data parallelism (ZeRO-3 style) via GSPMD annotations.

The reference has no parallelism of any kind (SURVEY.md §2.4 — a single
GPU job, `/root/reference/src/train.py:49`); ``parallel/mesh.py`` adds the
``(data, model)`` mesh and ``parallel/tp.py`` the Megatron conv-pair
sharding. This module adds the third production axis strategy: **shard the
training state itself over the data axis**, so per-chip memory for
params + EMA + Adam moments drops by ~1/N while the batch stays
data-parallel on the same axis.

Idiomatic TPU recipe (the scaling-book one): annotate each state leaf
with a ``NamedSharding`` that splits its largest divisible dimension over
``data``, hand the pytree to ``make_train_step(state_shardings=...)``,
and let GSPMD insert the collectives — per-use all-gathers of the weights
(forward and backward) and reduce-scatters of the gradients. That *is*
ZeRO-3/FSDP semantics; nothing else changes, because ``training/steps.py``
already takes arbitrary state shardings (the TP hook).

Why it matters at this model family's scale: the 256² flagship carries
37.7M params → with EMA + Adam mu/nu that is 4 f32 mirrors ≈ 604 MB of
state per chip replicated; on an 8-chip v5e slice FSDP cuts it to ~76 MB,
freeing HBM for activation-heavy 256² batches (the donated train step's
working set is activation-dominated). On larger derived models (this is a
framework, not one checkpoint) it is the difference between fitting and
not.

Dimension choice per leaf: the *last* dimension that divides by the mesh's
data-axis size, preferring later dims (output channels / features) because
conv kernels are (kh, kw, Cin, Cout) and HWIO all-gathers on Cout are
contiguous lane-dim slices; 1-D leaves (biases, norm scales) shard on
their only dim when divisible. Leaves with no divisible dim (scalars,
``step``, RNG keys, tiny embeddings) replicate — always correct, and
exactly what full FSDP implementations do with odd remainders.

Composition with TP: :func:`state_shardings` takes the TP rule first when
``tensor_parallel=True`` — a leaf the TP rule shards on ``model`` gets its
FSDP ``data`` split on a *different* dimension (or none), giving the
standard 2-D "FSDP outer, TP inner" layout on one mesh.

Validated on the virtual 8-device CPU mesh (tests/test_fsdp.py): leaves
really shard, one donated train step matches the replicated DP step
bit-for-tolerance, updated state keeps its shardings, and the TP+FSDP
composition holds parity on a (data=4, model=2) mesh. The driver's
``dryrun_multichip`` exercises an FSDP leg.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from superdiff_tpu.parallel.mesh import DATA_AXIS
from superdiff_tpu.parallel import tp as _tp


def spec_for_leaf(leaf, mesh: Mesh, taken: P = P()) -> P:
    """FSDP PartitionSpec for one state leaf.

    Splits the last dimension divisible by the data-axis size that is not
    already claimed by ``taken`` (a TP spec on the model axis). Returns a
    spec of the leaf's full rank, or ``P()`` to replicate.
    """
    n = mesh.shape.get(DATA_AXIS, 1)
    shape = getattr(leaf, "shape", ())
    ndim = getattr(leaf, "ndim", 0)
    if n <= 1 or ndim == 0:
        return taken
    # dtype guard: only shard real array leaves (skip PRNG keys and
    # anything opaque); typed keys have a non-numeric dtype name
    dtype = getattr(leaf, "dtype", None)
    if dtype is None or jax.dtypes.issubdtype(dtype, jax.dtypes.prng_key):
        return taken
    base = tuple(taken) + (None,) * (ndim - len(tuple(taken)))
    for dim in range(ndim - 1, -1, -1):
        if base[dim] is None and shape[dim] % n == 0 and shape[dim] >= n:
            spec = list(base)
            spec[dim] = DATA_AXIS
            return P(*spec)
    return P(*base) if any(a is not None for a in base) else P()


def param_shardings(tree: Any, mesh: Mesh,
                    tensor_parallel: bool = False) -> Any:
    """NamedSharding pytree: FSDP over ``data`` (optionally composed with
    the Megatron TP rule over ``model``) for ``tree`` or any mirror of it
    (EMA, Adam moments — their leaf paths carry the same module names)."""
    def f(path, leaf):
        taken = P()
        if tensor_parallel:
            taken = _tp._guarded(_tp.spec_for_path(path, leaf), leaf, mesh)
        return NamedSharding(mesh, spec_for_leaf(leaf, mesh, taken))
    return jax.tree_util.tree_map_with_path(f, tree)


def state_shardings(state: Any, mesh: Mesh,
                    tensor_parallel: bool = False) -> Any:
    """Shardings for a full TrainState (params/EMA/opt-state mirrors shard;
    scalars and RNG keys replicate). Pass the result to
    ``make_train_step(state_shardings=...)``."""
    return param_shardings(state, mesh, tensor_parallel=tensor_parallel)


def shard_state(state: Any, mesh: Mesh,
                tensor_parallel: bool = False) -> Any:
    """Device-put a TrainState fully sharded for FSDP(+TP) execution."""
    return jax.device_put(
        state, state_shardings(state, mesh, tensor_parallel=tensor_parallel))
