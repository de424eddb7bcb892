"""Train the metric-of-record feature extractor (VERDICT r4 #2).

The reference ranks generated images in LEARNED feature spaces
(downloaded ResNet18 / CheXNet / BiomedCLIP backbones,
``src/models/feature_extractor.py:8-51``); this image has no egress, so
rounds 2-4 scored FID under *random-init* shared extractors (seeded
projection + random ResNet18). This script closes that gap in-framework:
it trains ``analysis.features.SmallCNN`` as a 3-way
NORMAL / TB / PNEUMONIA classifier on the synthetic split (both disease
trees, train split, no augmentation), validates on the val split, and
freezes the best checkpoint as a ``save_classifier`` .npz under
``artifacts/extractors/`` — the third shared extractor
(``--extractor classifier`` in ``cli.evaluate``), whose 256-d GAP
features are *semantically meaningful* for this domain.

Usage:
    python scripts/train_extractor.py \
        --dataset-root data/chest_xray \
        --out artifacts/extractors/smallcnn_trained_256.npz
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset-root", default="data/chest_xray")
    p.add_argument("--out",
                   default="artifacts/extractors/smallcnn_trained_256.npz")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--widths", default="32,64,128,256,256")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from superdiff_tpu.analysis.features import SmallCNN, save_classifier
    from superdiff_tpu.config import Config
    from superdiff_tpu.data import DataModule
    from superdiff_tpu.utils.env import host_init

    widths = tuple(int(w) for w in args.widths.split(","))
    # 3-way label space: NORMAL=0 (both trees), TB=1, PNEUMONIA=2.
    # Per-tree indices sort class names alphabetically, so the disease
    # class is 1 in both trees (data/dataset.py:40-46).
    remap = {"TB": {0: 0, 1: 1}, "PNEUMONIA": {0: 0, 1: 2}}

    def make_dm(task):
        cfg = Config()
        cfg.task = task
        cfg.training.resolution = args.resolution
        cfg.training.batch_size = args.batch_size
        # no augmentation: FID extraction sees clean images, and the
        # eccentricity signal is global geometry (measured: aug +
        # adamw-3e-4 never escaped the majority-class plateau at 2562)
        cfg.training.augmentation = "none"
        cfg.training.seed = args.seed
        return cfg, DataModule(cfg, args.dataset_root)

    dms = [make_dm(task) for task in ("TB", "PNEUMONIA")]

    model = SmallCNN(num_classes=3, widths=widths)
    rng = jax.random.PRNGKey(args.seed)
    sample = jnp.zeros((1, args.resolution, args.resolution, 1))
    params = host_init(
        lambda r: model.init(r, sample), rng,
        cache_key=f"smallcnn_{args.resolution}_{widths}_{args.seed}")
    nparams = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"SmallCNN widths={widths} params={nparams/1e6:.2f}M", flush=True)

    tx = optax.adam(optax.cosine_decay_schedule(
        args.lr, args.epochs * (4096 // args.batch_size)))
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(p, x)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return ce.mean(), logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = (jnp.argmax(logits, -1) == y).mean()
        return params, opt_state, loss, acc

    @jax.jit
    def eval_step(params, x, y):
        logits = model.apply(params, x)
        return (jnp.argmax(logits, -1) == y).astype(jnp.float32).sum()

    best_acc, best_params = -1.0, params
    for epoch in range(args.epochs):
        tic = time.time()
        losses, accs = [], []
        for (cfg, dm), task in zip(dms, ("TB", "PNEUMONIA")):
            rng, drng = jax.random.split(rng)
            for batch in dm.device_batches("train", drng):
                y = jnp.asarray(
                    np.vectorize(remap[task].get)(
                        np.asarray(batch["label"])), jnp.int32)
                params, opt_state, loss, acc = train_step(
                    params, opt_state, batch["image"], y)
                losses.append(loss)   # stays on device until epoch end
                accs.append(acc)
        # one host sync per epoch (CLAUDE.md: never per-step float())
        tr_loss = float(jnp.mean(jnp.stack(losses)))
        tr_acc = float(jnp.mean(jnp.stack(accs)))

        correct, total = 0.0, 0
        for (cfg, dm), task in zip(dms, ("TB", "PNEUMONIA")):
            rng, vrng = jax.random.split(rng)
            for batch in dm.device_batches("val", vrng):
                y = jnp.asarray(
                    np.vectorize(remap[task].get)(
                        np.asarray(batch["label"])), jnp.int32)
                correct += float(eval_step(params, batch["image"], y))
                total += int(batch["image"].shape[0])
        val_acc = correct / max(total, 1)
        marker = ""
        if val_acc > best_acc:
            best_acc, best_params = val_acc, params
            marker = "  <- best"
        print(f"epoch {epoch + 1}/{args.epochs} loss={tr_loss:.4f} "
              f"train_acc={tr_acc:.3f} val_acc={val_acc:.3f} "
              f"({time.time() - tic:.0f}s){marker}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_classifier(
        args.out, jax.device_get(best_params), widths, 3,
        meta={"val_acc": best_acc, "resolution": args.resolution,
              "seed": args.seed, "epochs": args.epochs,
              "dataset_root": args.dataset_root,
              "labels": {"NORMAL": 0, "TB": 1, "PNEUMONIA": 2}})
    print(f"saved {args.out} (best val_acc={best_acc:.3f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
