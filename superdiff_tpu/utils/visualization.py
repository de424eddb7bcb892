"""Image-artifact helpers: grids, real-vs-generated, trajectory strips.

Capability of ``src/utils/visualization.py`` and ``src/visualization/
images.py``, with the reference's forward/reverse mislabel fixed: its
``plot_reverse_diffusion`` actually plots *forward* ``q_sample`` corruption
(``src/utils/visualization.py:12-15``); here the two directions are separate,
honestly named functions.

All functions take NHWC float arrays (any normalization; they rescale for
display) and write PNGs with matplotlib's Agg backend — no display needed.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _to_display(img: np.ndarray) -> np.ndarray:
    """(H, W, 1|3) any-range float -> [0,1] for imshow."""
    img = np.asarray(img, dtype=np.float32)
    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[..., 0]
    lo, hi = float(img.min()), float(img.max())
    return (img - lo) / max(hi - lo, 1e-6)


def save_image_grid(images, path: str, ncols: int = 4,
                    titles: Optional[Sequence[str]] = None,
                    suptitle: Optional[str] = None) -> str:
    """NHWC batch -> grid PNG (capability of ``plot_image_grid``,
    ``src/visualization/images.py:10-30``)."""
    plt = _mpl()
    images = np.asarray(images)
    n = images.shape[0]
    ncols = min(ncols, n)
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=(2.2 * ncols, 2.2 * nrows),
                             squeeze=False)
    for i in range(nrows * ncols):
        ax = axes[i // ncols][i % ncols]
        ax.axis("off")
        if i < n:
            ax.imshow(_to_display(images[i]), cmap="gray")
            if titles is not None and i < len(titles):
                ax.set_title(str(titles[i]), fontsize=8)
    if suptitle:
        fig.suptitle(suptitle)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=90)
    plt.close(fig)
    return path


def to_display_array(img) -> np.ndarray:
    """Coerce ANY common image container to a displayable (H, W[, 3])
    float array in [0, 1] — capability of the reference's universal
    ``show_image`` (``src/visualization/images.py:45-101``), which accepts
    PIL / torch CHW / numpy HWC interchangeably. Handles: PIL images,
    numpy / JAX arrays in HW, HWC, CHW (incl. leading batch-of-1), any
    value range, grayscale or RGB.
    """
    if hasattr(img, "convert") and hasattr(img, "size"):  # PIL duck-type
        img = np.asarray(img.convert("L"), dtype=np.float32)
    img = np.asarray(img, dtype=np.float32)
    if img.ndim == 4 and img.shape[0] == 1:    # (1, ., ., .) batch-of-1
        img = img[0]
    if img.ndim == 3:
        if img.shape[0] in (1, 3) and img.shape[-1] not in (1, 3):
            img = np.moveaxis(img, 0, -1)       # CHW -> HWC
        if img.shape[-1] == 1:
            img = img[..., 0]
    if img.ndim not in (2, 3):
        raise ValueError(f"cannot display image of shape {img.shape}")
    lo, hi = float(img.min()), float(img.max())
    return (img - lo) / max(hi - lo, 1e-6)


def show_image(img, path: Optional[str] = None,
               title: Optional[str] = None, cmap: str = "gray") -> str:
    """Display (write) one image from any container/layout; returns the
    written path (defaults to ``show_image.png`` in the cwd). The headless
    stand-in for the reference's interactive ``show_image``."""
    plt = _mpl()
    arr = to_display_array(img)
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.imshow(arr, cmap=None if arr.ndim == 3 else cmap)
    ax.axis("off")
    if title:
        ax.set_title(title)
    path = path or "show_image.png"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=90)
    plt.close(fig)
    return path


def save_real_vs_generated(real, generated, path: str) -> str:
    """Side-by-side real/generated rows (capability of
    ``show_real_vs_generated``, ``src/utils/visualization.py:31-62``)."""
    plt = _mpl()
    real, generated = np.asarray(real), np.asarray(generated)
    n = min(real.shape[0], generated.shape[0], 8)
    fig, axes = plt.subplots(2, n, figsize=(2.0 * n, 4.2), squeeze=False)
    for i in range(n):
        axes[0][i].imshow(_to_display(real[i]), cmap="gray")
        axes[0][i].axis("off")
        axes[1][i].imshow(_to_display(generated[i]), cmap="gray")
        axes[1][i].axis("off")
    axes[0][0].set_ylabel("real")
    axes[1][0].set_ylabel("generated")
    fig.suptitle("top: real   bottom: generated")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=90)
    plt.close(fig)
    return path


def save_forward_diffusion_strip(schedule, x0, timesteps, rng, path: str
                                 ) -> str:
    """Forward ``q_sample`` corruption strip — what the reference's
    mislabeled ``plot_reverse_diffusion`` actually shows."""
    import jax
    import jax.numpy as jnp

    from superdiff_tpu.diffusion import q_sample

    plt = _mpl()
    x0 = jnp.asarray(x0[:1])
    noise = jax.random.normal(rng, x0.shape, dtype=x0.dtype)
    frames = [np.asarray(x0[0])]
    for t in timesteps:
        xt = q_sample(schedule, x0, jnp.asarray([t]), noise)
        frames.append(np.asarray(xt[0]))
    fig, axes = plt.subplots(1, len(frames),
                             figsize=(2.0 * len(frames), 2.2),
                             squeeze=False)
    labels = ["x0"] + [f"t={t}" for t in timesteps]
    for ax, frame, lab in zip(axes[0], frames, labels):
        ax.imshow(_to_display(frame), cmap="gray")
        ax.set_title(lab, fontsize=8)
        ax.axis("off")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=90)
    plt.close(fig)
    return path


def save_reverse_trajectory_strip(frames, path: str) -> str:
    """Reverse-sampling trajectory strip from ``ddpm_sample(num_frames=k)``
    — the *actual* reverse direction (frames: (K, B, H, W, C))."""
    plt = _mpl()
    frames = np.asarray(frames)
    K = frames.shape[0]
    fig, axes = plt.subplots(1, K, figsize=(2.0 * K, 2.2), squeeze=False)
    for k in range(K):
        axes[0][k].imshow(_to_display(frames[k, 0]), cmap="gray")
        axes[0][k].set_title(f"frame {k}", fontsize=8)
        axes[0][k].axis("off")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=90)
    plt.close(fig)
    return path


def save_loss_curve(losses: Sequence[float], path: str,
                    ylabel: str = "loss") -> str:
    """Loss-curve PNG (capability of ``training_logic.py:64-71``)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(6, 3.5))
    ax.plot(np.asarray(losses))
    ax.set_xlabel("step")
    ax.set_ylabel(ylabel)
    ax.grid(True, alpha=0.3)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=90)
    plt.close(fig)
    return path


def save_pixel_histogram(images, path: str, bins: int = 50) -> str:
    """Pixel-intensity histogram (capability of ``plot_histogram``,
    ``src/visualization/images.py:32-36``)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(5, 3.5))
    ax.hist(np.asarray(images).ravel(), bins=bins)
    ax.set_xlabel("pixel value")
    ax.set_ylabel("count")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=90)
    plt.close(fig)
    return path
