"""Latent projections: t-SNE / UMAP, 2D/3D, with optional image thumbnails.

Capability of ``src/visualization/tsne.py`` (``run_projection`` ``:37-59``,
``run_projection_with_thumbnails`` ``:61-124``,
``compare_tsne_umap_thumbnails`` ``:127-187``, ``run_projection_3d``
``:189-239``) and ``src/visualization/projection.py``. sklearn provides
t-SNE; UMAP uses umap-learn when installed and otherwise the built-in
NumPy implementation in ``analysis/umap_np.py``. Seeds fixed at 42 like
the reference.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

PROJECTION_METHODS = ("tsne", "umap", "pca")


def _standardize(features: np.ndarray) -> np.ndarray:
    """Per-feature zero-mean/unit-variance scaling before projection — the
    reference StandardScaler-scales features ahead of t-SNE
    (``src/visualization/embeddings.py:21-24``); without it un-normalized
    extractor outputs let a few large-scale dimensions dominate the
    distance metric. Constant features get std 1 (scaler semantics)."""
    f = np.asarray(features, dtype=np.float64)
    mean = f.mean(axis=0, keepdims=True)
    std = f.std(axis=0, keepdims=True)
    std[std == 0.0] = 1.0
    return (f - mean) / std


def _project(features: np.ndarray, method: str, n_components: int,
             seed: int = 42) -> np.ndarray:
    if method not in PROJECTION_METHODS:
        raise ValueError(f"unknown projection method {method!r} "
                         f"(have {PROJECTION_METHODS})")
    features = _standardize(features)
    if method == "tsne":
        from sklearn.manifold import TSNE

        perplexity = min(30.0, max(2.0, len(features) / 4 - 1))
        return TSNE(n_components=n_components, random_state=seed,
                    perplexity=perplexity, init="pca").fit_transform(
                        features.astype(np.float64))
    if method == "pca":
        from sklearn.decomposition import PCA

        return PCA(n_components=n_components,
                   random_state=seed).fit_transform(features)
    try:
        import umap
    except ImportError:
        from superdiff_tpu.analysis.umap_np import umap_embed

        return umap_embed(features, n_components=n_components, seed=seed)
    return umap.UMAP(n_components=n_components,
                     random_state=seed).fit_transform(features)


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _scatter(ax, emb, labels, class_names=None):
    labels = np.asarray(labels)
    for cls in np.unique(labels):
        m = labels == cls
        name = (class_names[cls] if class_names is not None
                and cls < len(class_names) else f"class {cls}")
        ax.scatter(*[emb[m, i] for i in range(emb.shape[1])],
                   s=12, alpha=0.7, label=name)
    ax.legend(fontsize=8)


def run_projection(features: np.ndarray, labels: np.ndarray,
                   method: str = "tsne", path: str = "projection.png",
                   class_names: Optional[Sequence[str]] = None,
                   title: Optional[str] = None) -> str:
    """2D scatter of projected features (``tsne.py:37-59``)."""
    emb = _project(features, method, 2)
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(6, 5))
    _scatter(ax, emb, labels, class_names)
    ax.set_title(title or f"{method} projection")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path


def _thumb_axes(ax, emb, images, zoom=0.6):
    from matplotlib.offsetbox import AnnotationBbox, OffsetImage

    images = np.asarray(images)
    for i in range(len(emb)):
        img = images[i]
        if img.ndim == 3 and img.shape[-1] == 1:
            img = img[..., 0]
        lo, hi = img.min(), img.max()
        img = (img - lo) / max(hi - lo, 1e-6)
        ab = AnnotationBbox(OffsetImage(img, cmap="gray", zoom=zoom),
                            tuple(emb[i, :2]), frameon=False)
        ax.add_artist(ab)


def run_projection_with_thumbnails(features, labels, images,
                                   method: str = "tsne",
                                   path: str = "projection_thumbs.png",
                                   title: Optional[str] = None,
                                   zoom: float = 0.6) -> str:
    """2D projection with image thumbnails at the embedding positions
    (``tsne.py:61-124``)."""
    emb = _project(features, method, 2)
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(8, 7))
    ax.scatter(emb[:, 0], emb[:, 1], s=1, alpha=0)
    _thumb_axes(ax, emb, images, zoom)
    ax.set_title(title or f"{method} with thumbnails")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path


def compare_tsne_umap_thumbnails(features, labels, images,
                                 path: str = "tsne_vs_umap.png",
                                 zoom: float = 0.5) -> str:
    """Side-by-side t-SNE vs UMAP thumbnail panels (``tsne.py:127-187``).
    UMAP comes from umap-learn when installed, else the built-in NumPy
    implementation (``analysis/umap_np.py``)."""
    plt = _mpl()
    methods = ["tsne", "umap"]
    fig, axes = plt.subplots(1, 2, figsize=(14, 7))
    for ax, method in zip(axes, methods):
        emb = _project(features, method, 2)
        ax.scatter(emb[:, 0], emb[:, 1], s=1, alpha=0)
        _thumb_axes(ax, emb, images, zoom)
        ax.set_title(method)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path


def run_projection_3d(features, labels, method: str = "tsne",
                      path: str = "projection3d.png",
                      class_names: Optional[Sequence[str]] = None,
                      interactive_html: Optional[str] = None,
                      animate_path: Optional[str] = None,
                      animate_frames: int = 36) -> str:
    """3D projection scatter (``tsne.py:189-239``); optionally also writes
    an interactive HTML via plotly when available (the reference's
    ``plotly.py:29-94`` capability, gated on the optional dep).

    ``animate_path``: also render the camera-rotation animation the
    reference sketched but left commented out
    (``src/visualization/projection.py:75-87``): a full azimuth sweep at
    fixed elevation, saved as GIF via PillowWriter (no ffmpeg needed —
    this image, like most TPU pods, ships none; the reference's dead code
    assumed FFMpegWriter). ``animate_frames`` controls smoothness/size."""
    emb = _project(features, method, 3)
    plt = _mpl()
    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(111, projection="3d")
    _scatter(ax, emb, labels, class_names)
    ax.set_title(f"{method} 3D")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=100)
    if animate_path:
        from matplotlib import animation

        def _update(angle):
            ax.view_init(elev=20, azim=float(angle))
            return (fig,)

        ani = animation.FuncAnimation(
            fig, _update, frames=np.linspace(0, 360, animate_frames,
                                             endpoint=False),
            interval=50, blit=False)
        os.makedirs(os.path.dirname(animate_path) or ".", exist_ok=True)
        ani.save(animate_path, writer=animation.PillowWriter(fps=15),
                 dpi=80)
    plt.close(fig)
    if interactive_html:
        try:
            from superdiff_tpu.analysis.plotly3d import (
                run_plotly_projection_3d_with_thumbnails)

            run_plotly_projection_3d_with_thumbnails(
                features, labels, images=None, path=interactive_html,
                method=method, class_names=class_names, emb=emb)
        except ImportError:
            import logging

            logging.getLogger("superdiff_tpu").warning(
                "plotly not installed; skipped interactive HTML export")
    return path
