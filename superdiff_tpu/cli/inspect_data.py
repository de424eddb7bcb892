"""Data-inspection CLI — capability of the reference's ``src/main.py``.

Config-toggle-driven runner over a dataset: class counts, sample batch
grid, augmentation variants, t-SNE/UMAP projections (2D/3D, thumbnails),
Grad-CAM — each behind a ``viz.*`` flag (the reference's toggle block,
``src/config/backup.yml:13-24``), with ``--set viz.tsne=true``-style
overrides replacing its flat-YAML mutation.

Usage:
    python -m superdiff_tpu.cli.inspect_data --dataset-root data/xray \
        --set viz.show_class_counts=true --set viz.tsne=true
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Inspect a chest X-ray dataset")
    p.add_argument("--config", default=None)
    p.add_argument("--dataset-root", required=True)
    p.add_argument("--task", default=None)
    p.add_argument("--split", default="train")
    p.add_argument("--out", default="inspect_out")
    p.add_argument("--max-samples", type=int, default=120)
    p.add_argument("--gradcam-backbone", default=None,
                   choices=["resnet18", "densenet121"],
                   help="CAM a pretrained backbone (reference behavior: "
                        "src/visualization/gradcam.py CAMs ResNet18 "
                        "layer4) instead of the in-framework classifier; "
                        "needs --gradcam-checkpoint")
    p.add_argument("--gradcam-checkpoint", default=None,
                   help="local torchvision-format state-dict (.pt/.npz) "
                        "WITH its classifier head")
    p.add_argument("--set", dest="overrides", action="append", default=[])
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    from superdiff_tpu.analysis import (
        FeatureExtractor, extract_features, run_projection,
        run_projection_with_thumbnails, compare_tsne_umap_thumbnails,
        run_projection_3d, run_gradcam)
    from superdiff_tpu.analysis.classifier import train_classifier
    from superdiff_tpu.config import load_config
    from superdiff_tpu.data import DataModule
    from superdiff_tpu.utils.logger import init_logger
    from superdiff_tpu.utils.visualization import (
        save_image_grid, save_pixel_histogram)
    from superdiff_tpu.data.transforms import augment

    cfg = load_config(args.config, args.overrides)
    if args.task:
        cfg.task = args.task
    logger = init_logger(None, stdout=True, level=logging.INFO)
    os.makedirs(args.out, exist_ok=True)

    dm = DataModule(cfg, args.dataset_root)
    idx = dm.index(args.split)
    logger.info("dataset: %d images, classes %s", len(idx), idx.classes)

    if cfg.viz.show_class_counts:
        counts = dm.class_counts(args.split)
        print("class counts:", counts)

    # collect a working set
    batches = []
    n = 0
    rng = jax.random.PRNGKey(0)
    for b in dm.device_batches(args.split, rng):
        batches.append({"image": np.asarray(b["image"]),
                        "label": np.asarray(b["label"])})
        n += len(b["label"])
        if n >= args.max_samples:
            break
    images = np.concatenate([b["image"] for b in batches])
    labels = np.concatenate([b["label"] for b in batches])

    if cfg.viz.show_batch or cfg.viz.image_grid:
        save_image_grid(images[:16], os.path.join(args.out, "batch.png"),
                        titles=[idx.classes[l] for l in labels[:16]])
        print("wrote batch.png")

    if cfg.viz.histograms:
        save_pixel_histogram(images, os.path.join(args.out, "hist.png"))
        print("wrote hist.png")

    if cfg.viz.show_augmented:
        import jax.numpy as jnp

        base = jnp.asarray(images[:4]) * 0.5 + 0.5  # back to [0,1]
        rows = [np.asarray(base)]
        for i in range(3):
            rows.append(np.asarray(augment(
                base, jax.random.PRNGKey(10 + i),
                risk=cfg.training.augmentation
                if cfg.training.augmentation != "none" else "low")))
        save_image_grid(np.concatenate(rows),
                        os.path.join(args.out, "augmented.png"), ncols=4,
                        suptitle="rows: original + 3 augmentation draws")
        print("wrote augmented.png")

    needs_features = (cfg.viz.tsne or cfg.viz.tsne_thumbnails
                      or cfg.viz.tsne_umap_thumbnails
                      or cfg.viz.projection_3d
                      or cfg.viz.projection_3d_thumbnails
                      or cfg.viz.projection_3d_plotly)
    if needs_features:
        ex = FeatureExtractor("random")
        feats, flabels = extract_features(ex, batches,
                                          max_samples=args.max_samples)
        if cfg.viz.tsne:
            run_projection(feats, flabels, "tsne",
                           os.path.join(args.out, "tsne.png"),
                           class_names=idx.classes)
            print("wrote tsne.png")
        if cfg.viz.tsne_thumbnails:
            run_projection_with_thumbnails(
                feats, flabels, images[:len(feats)], "tsne",
                os.path.join(args.out, "tsne_thumbs.png"))
            print("wrote tsne_thumbs.png")
        if cfg.viz.tsne_umap_thumbnails:
            compare_tsne_umap_thumbnails(
                feats, flabels, images[:len(feats)],
                os.path.join(args.out, "tsne_vs_umap.png"))
            print("wrote tsne_vs_umap.png")
        if (cfg.viz.projection_3d or cfg.viz.projection_3d_thumbnails
                or cfg.viz.projection_3d_plotly):
            run_projection_3d(feats, flabels, "tsne",
                              os.path.join(args.out, "projection3d.png"),
                              class_names=idx.classes)
            print("wrote projection3d.png")
        if cfg.viz.projection_3d_plotly:
            from superdiff_tpu.analysis import (
                run_plotly_projection_3d_with_thumbnails)
            try:
                run_plotly_projection_3d_with_thumbnails(
                    feats, flabels, images[:len(feats)],
                    os.path.join(args.out, "projection3d.html"),
                    class_names=idx.classes)
                print("wrote projection3d.html")
            except ImportError as e:
                print(f"skipped plotly HTML: {e}")

    if cfg.viz.gradcam:
        if args.gradcam_backbone:
            if not args.gradcam_checkpoint:
                print("--gradcam-backbone needs --gradcam-checkpoint",
                      file=sys.stderr)
                return 2
            from superdiff_tpu.analysis.gradcam import run_gradcam_backbone

            paths = run_gradcam_backbone(
                args.gradcam_backbone, args.gradcam_checkpoint, images[:8],
                os.path.join(args.out, "gradcam"))
        else:
            model, params, metrics = train_classifier(batches,
                                                      num_steps=150)
            print(f"classifier for CAM: acc={metrics['final_acc']:.2f}")
            paths = run_gradcam(model, params, images[:8],
                                os.path.join(args.out, "gradcam"),
                                class_names=idx.classes)
        print(f"wrote {len(paths)} gradcam overlays")

    return 0


if __name__ == "__main__":
    sys.exit(main())
