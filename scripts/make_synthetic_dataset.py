"""Generate the on-disk synthetic chest-X-ray dataset trees.

This image ships no medical data, so end-to-end training/eval runs use the
structured synthetic generator (``superdiff_tpu/data/synthetic.py``) written
out as the exact folder layout the reference consumes
(``/root/reference/src/data/dataset.py:14-25``):

    <root>/<TASK>/<split>/<CLASS>/*.png

Two task trees share the NORMAL style but give each disease a distinct
visual signature (style index into the generator's eccentricity ladder), so
TB-trained and PNEUMONIA-trained models learn genuinely different
distributions — the property SuperDiff superposition and the compare panels
need.

Deterministic given --seed; safe to re-run (skips complete trees).

Usage:
    python scripts/make_synthetic_dataset.py --root data/chest_xray \
        --resolution 256 --train 1024 --val 128 --test 256
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

from superdiff_tpu.data.synthetic import synthetic_xray_batch  # noqa: E402

# style indices into synthetic_xray_batch(num_classes=4)'s eccentricity
# ladder: NORMAL is shared; each disease gets its own silhouette.
STYLES = {"NORMAL": 0, "TB": 2, "PNEUMONIA": 3}
TASKS = {"TB": ["NORMAL", "TB"], "PNEUMONIA": ["NORMAL", "PNEUMONIA"]}


def write_class_dir(path: str, style: int, count: int, resolution: int,
                    seed: int) -> None:
    from PIL import Image

    os.makedirs(path, exist_ok=True)
    chunk = 64
    written = 0
    while written < count:
        n = min(chunk, count - written)
        imgs, _ = synthetic_xray_batch(
            n, resolution=resolution, num_classes=4,
            seed=seed + written, normalization="minmax",
            labels=np.full((n,), style, dtype=np.int64))
        for j in range(n):
            arr = (imgs[j, :, :, 0] * 255).astype(np.uint8)
            Image.fromarray(arr, "L").save(
                os.path.join(path, f"img{written + j:05d}.png"))
        written += n


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="data/chest_xray")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--train", type=int, default=1024, help="per class")
    p.add_argument("--val", type=int, default=128, help="per class")
    p.add_argument("--test", type=int, default=256, help="per class")
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args(argv)

    counts = {"train": args.train, "val": args.val, "test": args.test}
    for task, classes in TASKS.items():
        for split, n in counts.items():
            for cls in classes:
                d = os.path.join(args.root, task, split, cls)
                if os.path.isdir(d) and len(os.listdir(d)) >= n:
                    print(f"skip {d} (complete)")
                    continue
                # distinct seed per (task, split, class) leg
                leg_seed = (args.seed
                            + 1_000_000 * list(TASKS).index(task)
                            + 100_000 * list(counts).index(split)
                            + 10_000 * STYLES[cls])
                print(f"writing {n} x {args.resolution}px to {d}")
                write_class_dir(d, STYLES[cls], n, args.resolution, leg_seed)
    print("done:", args.root)
    return 0


if __name__ == "__main__":
    sys.exit(main())
