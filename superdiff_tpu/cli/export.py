"""Export a trained run as a portable, compact inference artifact.

The reference saves raw per-epoch ``state_dict``s and ships nothing
loadable (SURVEY.md §5.4: no load path exists). A full Orbax training
checkpoint here carries params + EMA + Adam moments (~5x the model size) —
the right thing for resume, the wrong thing for publishing a model. This
CLI snapshots just what sampling needs: the EMA parameters (one compressed
``.npz``, flattened ``a/b/c`` keys) next to the config snapshot, and
:func:`superdiff_tpu.inference.load_run` transparently loads such exported
directories wherever a run directory is accepted (sample/evaluate/compare).

Usage:
    python -m superdiff_tpu.cli.export --run-dir RUN --out artifacts/tb64
    python -m superdiff_tpu.cli.sample --run-dir artifacts/tb64 ...
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

EXPORT_FILE = "ema_params.npz"


def export_params(params, path: str, dtype: str = "float32") -> int:
    """Flatten a param pytree into one compressed npz; returns #arrays.

    numpy cannot round-trip ml_dtypes bfloat16 through npz (it serializes
    as raw ``|V2`` void), so bfloat16 arrays are stored as their uint16 bit
    pattern under a ``bf16:``-prefixed key and viewed back on load."""
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(params, sep="/")
    arrays = {}
    for k, v in flat.items():
        a = np.asarray(v)
        if dtype == "bfloat16":
            import ml_dtypes

            arrays["bf16:" + k] = a.astype(ml_dtypes.bfloat16).view(
                np.uint16)
        else:
            arrays[k] = a.astype(dtype)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **arrays)
    return len(arrays)


def load_exported_params(path: str):
    """npz -> param pytree (inverse of :func:`export_params`)."""
    from flax.traverse_util import unflatten_dict

    flat = {}
    with np.load(path) as z:
        for k in z.files:
            a = z[k]
            if k.startswith("bf16:"):
                import ml_dtypes

                k, a = k[len("bf16:"):], a.view(ml_dtypes.bfloat16)
            flat[tuple(k.split("/"))] = a
    return unflatten_dict(flat)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Export a run's EMA params + config for inference")
    p.add_argument("--run-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "float16", "bfloat16"])
    args = p.parse_args(argv)

    from superdiff_tpu.config import save_config
    from superdiff_tpu.inference import load_run

    cfg, model, schedule, ema = load_run(args.run_dir, step=args.step)
    os.makedirs(args.out, exist_ok=True)
    n = export_params(ema, os.path.join(args.out, EXPORT_FILE), args.dtype)
    save_config(cfg, os.path.join(args.out, "config.yaml"))
    size = os.path.getsize(os.path.join(args.out, EXPORT_FILE))
    print(f"exported {n} arrays ({size/1e6:.1f} MB, {args.dtype}) "
          f"to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
