"""Grad-CAM via ``jax.grad`` — no forward/backward hooks needed.

Capability of ``src/visualization/gradcam.py:17-64`` (manual hook-based CAM
on a pretrained ResNet) and the captum variant (``explainability.py:5-17``,
broken in the reference). In JAX the "hooks" disappear: the classifier is
split functionally (features -> head), and the gradient of the chosen logit
w.r.t. the feature map is one ``jax.grad`` call. CAM = ReLU(sum_c mean(dA_c)
* A_c) / max — the same weighting as the reference.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from superdiff_tpu.analysis.features import SmallCNN


def compute_gradcam(model: SmallCNN, params, image: jnp.ndarray,
                    class_idx: Optional[int] = None
                    ) -> Tuple[np.ndarray, int]:
    """CAM for one image ``(H, W, C)`` -> (heatmap [0,1] (h, w), class)."""
    x = jnp.asarray(image)[None]

    logits, feats = model.apply(params, x, return_features=True)
    pred = int(jnp.argmax(logits[0])) if class_idx is None else class_idx

    # functional split: re-run only the GAP + head on the feature map and
    # differentiate the chosen logit w.r.t. it (replaces torch hooks)
    def head_logit(f):
        import flax.linen as nn

        pooled = jnp.mean(f, axis=(1, 2))
        dense = nn.Dense(model.num_classes)
        out = dense.apply({"params": params["params"]["head"]}, pooled)
        return out[0, pred]

    grads = jax.grad(head_logit)(feats)           # (1, h, w, C)
    weights = jnp.mean(grads[0], axis=(0, 1))     # (C,)
    cam = jnp.maximum(jnp.sum(weights * feats[0], axis=-1), 0.0)
    cam = cam / jnp.maximum(jnp.max(cam), 1e-8)
    return np.asarray(cam), pred


def overlay_heatmap(image: np.ndarray, cam: np.ndarray,
                    alpha: float = 0.45) -> np.ndarray:
    """Bilinear-resize CAM to the image and jet-blend (capability of
    ``gradcam.py:46-64``). Returns an RGB float array in [0,1]."""
    import matplotlib.cm as mpl_cm

    image = np.asarray(image, dtype=np.float32)
    if image.ndim == 3 and image.shape[-1] == 1:
        image = image[..., 0]
    lo, hi = image.min(), image.max()
    gray = (image - lo) / max(hi - lo, 1e-6)

    cam_img = jax.image.resize(jnp.asarray(cam), image.shape, "bilinear")
    heat = mpl_cm.jet(np.asarray(cam_img))[..., :3]
    base = np.stack([gray] * 3, axis=-1)
    return np.clip((1 - alpha) * base + alpha * heat, 0.0, 1.0)


def run_gradcam(model: SmallCNN, params, images, out_dir: str,
                max_images: int = 8, class_names=None) -> list:
    """CAM overlays for a batch -> PNGs (capability of
    ``gradcam.py:66-73``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    images = np.asarray(images)[:max_images]
    for i, img in enumerate(images):
        cam, pred = compute_gradcam(model, params, img)
        overlay = overlay_heatmap(img, cam)
        fig, axes = plt.subplots(1, 2, figsize=(6, 3))
        show = img[..., 0] if img.ndim == 3 and img.shape[-1] == 1 else img
        axes[0].imshow(show, cmap="gray")
        axes[0].set_title("input")
        axes[1].imshow(overlay)
        name = (class_names[pred] if class_names and
                pred < len(class_names) else f"class {pred}")
        axes[1].set_title(f"Grad-CAM ({name})")
        for ax in axes:
            ax.axis("off")
        p = os.path.join(out_dir, f"gradcam_{i}.png")
        fig.tight_layout()
        fig.savefig(p, dpi=90)
        plt.close(fig)
        paths.append(p)
    return paths
