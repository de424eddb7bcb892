"""Tensor parallelism for the CondUNet — Megatron-style GSPMD shardings.

The reference has no parallelism of any kind (SURVEY.md §2.4: no
DistributedDataParallel, no torch.distributed — `/root/reference/src/train.py:49`
picks one device). The survey's TP verdict is "not needed for this model
size; expose mesh axis so UNet channels *can* shard". ``parallel/mesh.py``
exposes that axis; this module makes it real: parameter shardings that let
XLA's SPMD partitioner (GSPMD) run every ResBlock's conv pair
column/row-parallel over the ``model`` mesh axis, composing freely with
data parallelism on the ``data`` axis.

Design (idiomatic TPU: annotate shardings, let GSPMD insert collectives —
the scaling-book recipe — rather than hand-writing comms):

- ``conv_0`` (3,3,Cin,Cout): **column-parallel** — kernel sharded on the
  output-channel axis, bias sharded. Its activations come out
  channel-sharded.
- ``norm_1`` scale/bias: sharded on channels. GroupNorm statistics reduce
  *within* groups; every preset's group count (32, or the
  ``num_groups_for`` fallback) is a multiple of any practical model-axis
  size, so each shard holds whole groups and the stats stay local.
- ``conv_1`` (3,3,Cout,Cout2): **row-parallel** — kernel sharded on the
  *input*-channel axis, consuming the channel-sharded activations
  directly; GSPMD closes the pair with one reduce over the partial sums
  (the classic Megatron column→row pairing, arXiv:1909.08053 §3, done
  here by the partitioner instead of hand-written all-reduces).
- Everything else (time/class embeddings, ``emb_proj`` FiLM projections,
  skip/1×1 convs, attention, the stem and head) is replicated: the conv
  pairs carry the overwhelming share of FLOPs and bytes, FiLM's
  per-sample (B, C) vectors broadcast for free against channel-sharded
  activations, and replicated attention keeps the Pallas flash kernel
  (opaque to GSPMD) off the collective path.

The rules key on parameter-tree *names* (``conv_0``/``conv_1``/``norm_1``
exist only inside ResBlocks), so the same function shards ``params``,
``ema_params`` and the Adam ``mu``/``nu`` mirrors inside ``opt_state`` —
``state_shardings`` just walks the whole TrainState.

Validated on the virtual 8-device CPU mesh (tests/test_tp.py): forward
parity, full-train-step parity vs the replicated path, and genuinely
sharded leaves. Real multi-chip hardware is not available in this image;
the driver's ``dryrun_multichip`` exercises a (data=4, model=2) leg.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from superdiff_tpu.parallel.mesh import MODEL_AXIS


def _key_name(k) -> str:
    """Best-effort name for one path entry (DictKey / GetAttrKey / index)."""
    for attr in ("key", "name", "idx"):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def spec_for_path(path, leaf) -> P:
    """PartitionSpec for one parameter (or optimizer-mirror) leaf.

    Only ResBlock conv pairs shard; ``P()`` (replicated) otherwise. Skips
    leaves whose sharded axis would not divide by the mesh — divisibility
    is checked by the caller (``_guarded``) because it needs the mesh.
    """
    names = [_key_name(k) for k in path]
    if not names:
        return P()
    leaf_name = names[-1]
    module = names[-2] if len(names) >= 2 else ""
    if module == "conv_0":
        if leaf_name == "kernel" and getattr(leaf, "ndim", 0) == 4:
            return P(None, None, None, MODEL_AXIS)     # column: out ch
        if leaf_name == "bias" and getattr(leaf, "ndim", 0) == 1:
            return P(MODEL_AXIS)
    elif module == "norm_1":
        if getattr(leaf, "ndim", 0) == 1:
            return P(MODEL_AXIS)                        # per-channel affine
    elif module == "conv_1":
        if leaf_name == "kernel" and getattr(leaf, "ndim", 0) == 4:
            return P(None, None, MODEL_AXIS, None)      # row: in ch
        # conv_1 bias adds to the reduced (replicated) output
    return P()


def _guarded(spec: P, leaf, mesh: Mesh) -> P:
    """Drop the sharding when the target axis doesn't divide evenly
    (e.g. a 1-channel stem conv) — GSPMD requires divisibility only for
    the explicit annotation; replicating odd leaves is always correct."""
    m = mesh.shape.get(MODEL_AXIS, 1)
    if m <= 1:
        return P()
    for dim, axis in enumerate(spec):
        if axis == MODEL_AXIS and leaf.shape[dim] % m:
            return P()
    return spec


def param_shardings(tree: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for ``tree`` (params or any mirror of it)."""
    def f(path, leaf):
        return NamedSharding(mesh, _guarded(spec_for_path(path, leaf),
                                            leaf, mesh))
    return jax.tree_util.tree_map_with_path(f, tree)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Device-put ``params`` with the TP shardings (one transfer)."""
    return jax.device_put(params, param_shardings(params, mesh))


def state_shardings(state: Any, mesh: Mesh) -> Any:
    """Shardings for a full TrainState: params/EMA/Adam-mirrors shard by
    the name rules (their leaf paths carry the same module names), scalars
    and RNG keys replicate."""
    return param_shardings(state, mesh)


def shard_state(state: Any, mesh: Mesh) -> Any:
    """Device-put a TrainState for TP+DP execution under jit."""
    return jax.device_put(state, state_shardings(state, mesh))
