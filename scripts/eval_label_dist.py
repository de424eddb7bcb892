"""Semantic check for superposition (distillation): classify samples
under the TRAINED SmallCNN extractor and report the label distribution.

An OR-superposed TB+PNEUMONIA sampler should emit a mix the classifier
reads as both diseases; a faithful distilled student must preserve that
mix. Works on a ``samples.npy`` (cli.sample output, model space ~[-1,1])
or a dataset-tree split dir of PNGs (converted with the same tanh
normalization the classifier trained on).

Usage:
    python scripts/eval_label_dist.py --classifier CNN.npz \
        --npy samples/samples.npy --out dist.json
    python scripts/eval_label_dist.py --classifier CNN.npz \
        --tree data/super_or/SUPERPOSED/test/SUPERPOSED --out dist.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--classifier", required=True,
                   help="save_classifier .npz (scripts/train_extractor.py)")
    p.add_argument("--npy", default=None, help="samples.npy (model space)")
    p.add_argument("--tree", default=None, help="dir of PNGs (one split)")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--max-samples", type=int, default=1024)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    if (args.npy is None) == (args.tree is None):
        raise SystemExit("exactly one of --npy / --tree")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from superdiff_tpu.analysis.features import load_classifier

    model, params = load_classifier(args.classifier)

    if args.npy:
        x = np.load(args.npy).astype(np.float32)
        src = args.npy
    else:
        from PIL import Image
        files = sorted(f for f in os.listdir(args.tree)
                       if f.lower().endswith((".png", ".jpg", ".jpeg")))
        files = files[:args.max_samples]
        imgs = [np.asarray(Image.open(os.path.join(args.tree, f))
                           .convert("L"), dtype=np.float32) / 255.0
                for f in files]
        # tanh normalization — the pipeline the classifier trained on
        x = np.stack(imgs)[..., None] * 2.0 - 1.0
        src = args.tree
    x = x[:args.max_samples]

    @jax.jit
    def probs_of(xb):
        return jax.nn.softmax(model.apply(params, xb), axis=-1)

    B = args.batch_size
    probs = np.concatenate([np.asarray(probs_of(jnp.asarray(x[i:i + B])))
                            for i in range(0, len(x), B)])
    pred = probs.argmax(-1)
    names = ["NORMAL", "TB", "PNEUMONIA"]
    result = {
        "source": src,
        "num_samples": int(len(x)),
        "label_fraction": {n: float((pred == i).mean())
                           for i, n in enumerate(names)},
        "mean_probability": {n: float(probs[:, i].mean())
                             for i, n in enumerate(names)},
        "mean_entropy": float(
            -(probs * np.log(np.clip(probs, 1e-9, 1))).sum(-1).mean()),
        "sample_mean": float(x.mean()),
        "sample_std": float(x.std()),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
