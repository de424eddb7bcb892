"""Pipeline parallelism: two-stage UNet split with microbatch overlap.

The last axis in the parallelism matrix (after DP, TP ``parallel/tp.py``,
FSDP ``parallel/fsdp.py``, CP ``parallel/cp.py`` and EP ``parallel/ep.py``).
The reference has no parallelism of any kind (SURVEY.md §2.4); this module
exists for the regime none of the others address for free: a model whose
*parameters plus activations do not fit one chip* and whose weights you do
not want re-gathered every microbatch (FSDP's cost). Split the UNet at its
bottleneck — stage 0 = embeddings + stem + down path, stage 1 = mid + up +
out — put each stage's parameters on their own device, and stream
microbatches through: while stage 1 denoises microbatch *i*, stage 0 is
already computing microbatch *i+1*.

TPU-native shape: the pipeline engine is **JAX async dispatch itself**.
Each stage is a jit whose placement follows its committed operands (the
stage's params live on its device), the host submits stage-0(mb[i+1])
before blocking on stage-1(mb[i]), so the two executables overlap on
their devices and the inter-stage payload (bottleneck activations +
skips + emb) rides a device-to-device transfer (ICI on a real slice). No scheduler
thread, no mailboxes — the XLA runtime's stream ordering is the schedule.
This is the inference/serving pipeline (GPipe-style fwd only); training
at this model family's size is served by DP/FSDP, which the train step
already shards.

Checkpoint compatibility: stage parameters are *name subsets* of one full
checkpoint (``CondUNet.__call__(stage=...)`` creates identically-named
modules), so :func:`split_params` slices any trained run without a
separate pipeline checkpoint format. Each device holds only its stage's
slice — at the flagship's 37.7M params the split is ~40/60, and the
payload per microbatch is O(activations), not O(params).

Validated on CPU devices (tests/test_pp.py): microbatched two-device
pipeline output equals the single-device forward bit-for-tolerance, the
stage subsets partition the checkpoint, and each stage's params live only
on its device.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_DOWN_PREFIXES = ("time_mlp", "class_emb", "stem", "down_")
_UP_PREFIXES = ("mid_", "up_", "out_")


def split_params(params: Any) -> Tuple[Any, Any]:
    """Split one full CondUNet checkpoint into (stage0, stage1) subsets by
    top-level module name. The subsets partition the tree (validated)."""
    out = []
    for prefixes in (_DOWN_PREFIXES, _UP_PREFIXES):
        out.append({
            coll: {k: v for k, v in tree.items()
                   if k.startswith(prefixes)}
            for coll, tree in params.items()})
    n0 = len(out[0].get("params", {}))
    n1 = len(out[1].get("params", {}))
    total = len(params.get("params", {}))
    if n0 + n1 != total:
        missing = [k for k in params.get("params", {})
                   if not k.startswith(_DOWN_PREFIXES + _UP_PREFIXES)]
        raise ValueError(f"stage split lost modules: {missing}")
    return out[0], out[1]


def make_pp_denoiser(model, params: Any,
                     devices: Optional[Sequence[jax.Device]] = None,
                     num_microbatches: int = 2) -> Callable:
    """Build ``fn(x, t, y) -> eps`` running the two-stage pipeline.

    ``devices``: the two devices to pin the stages to (defaults to
    ``jax.devices()[:2]``). The batch must divide by
    ``num_microbatches``; each microbatch flows stage0(dev0) →
    transfer → stage1(dev1), with consecutive microbatches overlapping
    across the two devices via async dispatch.
    """
    devs = list(devices if devices is not None else jax.devices()[:2])
    if len(devs) != 2:
        raise ValueError(f"need exactly 2 devices, got {len(devs)}")
    p0, p1 = split_params(params)
    p0 = jax.device_put(p0, devs[0])
    p1 = jax.device_put(p1, devs[1])

    @jax.jit
    def stage0(p, x, t, y):
        return model.apply(p, x, t, y, stage="down")

    @jax.jit
    def stage1(p, state):
        return model.apply(p, None, None, stage="up", pp_state=state)

    conditional = getattr(model, "num_classes", 0) > 0

    def fn(x, t, y=None):
        B = x.shape[0]
        m = num_microbatches
        if B % m:
            raise ValueError(f"batch {B} not divisible by "
                             f"{m} microbatches")
        if conditional and y is None:
            raise ValueError(
                "conditional model requires labels y; pass "
                f"y=full(null_label={model.null_label}) for "
                "unconditional use")
        mb = B // m
        x0 = jax.device_put(x, devs[0])
        t0 = jax.device_put(t, devs[0])
        y0 = jax.device_put(y, devs[0]) if conditional else None

        outs = []
        for i in range(m):
            sl = slice(i * mb, (i + 1) * mb)
            yi = y0[sl] if conditional else None
            state = stage0(p0, x0[sl], t0[sl], yi)   # async on dev0
            state = jax.device_put(state, devs[1])
            outs.append(stage1(p1, state))      # async on dev1; the host
            # immediately loops to submit stage0(mb[i+1]) — dev0 computes
            # it while dev1 runs this stage1 (the pipeline overlap)
        return jnp.concatenate(outs)

    return fn
