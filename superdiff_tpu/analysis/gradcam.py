"""Grad-CAM via ``jax.grad`` — no forward/backward hooks needed.

Capability of ``src/visualization/gradcam.py:17-64`` (manual hook-based CAM
on a pretrained ResNet18's ``layer4``) and the captum variant
(``explainability.py:5-17``, broken in the reference). In JAX the "hooks"
disappear: the classifier is split functionally (feature map -> head), and
the gradient of the chosen logit w.r.t. the feature map is one ``jax.grad``
call. CAM = ReLU(sum_c mean(dA_c) * A_c) / max — the same weighting as the
reference.

Targets: the in-framework ``SmallCNN`` classifier, or a pretrained
backbone loaded from a local torchvision-format checkpoint
(``resnet18``/``densenet121`` — the reference's actual CAM subject), via
the feature-map/head splits in ``analysis/resnet.py`` /
``analysis/densenet.py``.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from superdiff_tpu.analysis.features import SmallCNN


def compute_gradcam_from_fns(fmap_fn: Callable, head_fn: Callable,
                             image: jnp.ndarray,
                             class_idx: Optional[int] = None
                             ) -> Tuple[np.ndarray, int]:
    """Generic Grad-CAM: ``fmap_fn(x[None]) -> (1, h, w, C)`` feature map,
    ``head_fn(fmap) -> (1, n_classes)`` logits. Returns
    ``(heatmap [0,1] (h, w), predicted_or_requested_class)``."""
    x = jnp.asarray(image)[None]
    feats = fmap_fn(x)                                   # (1, h, w, C)
    logits = head_fn(feats)
    pred = int(jnp.argmax(logits[0])) if class_idx is None else class_idx

    grads = jax.grad(lambda f: head_fn(f)[0, pred])(feats)
    weights = jnp.mean(grads[0], axis=(0, 1))            # (C,)
    cam = jnp.maximum(jnp.sum(weights * feats[0], axis=-1), 0.0)
    cam = cam / jnp.maximum(jnp.max(cam), 1e-8)
    return np.asarray(cam), pred


def make_backbone_cam_fns(backbone: str, checkpoint: str
                          ) -> Tuple[Callable, Callable]:
    """``(fmap_fn, head_fn)`` for a pretrained backbone from a local
    torchvision-format checkpoint (must include its classifier head).

    ``resnet18`` targets ``layer4`` — exactly the reference's hook point
    (``src/visualization/gradcam.py:15``); ``densenet121`` targets
    ``relu(norm5)``, the standard DenseNet CAM layer.
    """
    if backbone == "resnet18":
        from superdiff_tpu.analysis.resnet import (
            load_torch_resnet18, resnet18_feature_map, resnet18_logits)

        params = load_torch_resnet18(checkpoint)
        if "fc" not in params:
            raise KeyError(f"{checkpoint} has no fc head — Grad-CAM needs "
                           "the classifier logits")
        return (lambda x: resnet18_feature_map(params, x),
                lambda f: resnet18_logits(params, f))
    if backbone == "densenet121":
        from superdiff_tpu.analysis.densenet import (
            load_torch_densenet121, densenet121_feature_map,
            densenet121_logits)

        params = load_torch_densenet121(checkpoint)
        if "classifier" not in params:
            raise KeyError(f"{checkpoint} has no classifier head — "
                           "Grad-CAM needs the logits")
        return (lambda x: densenet121_feature_map(params, x),
                lambda f: densenet121_logits(params, f))
    raise ValueError(f"unknown Grad-CAM backbone {backbone!r} "
                     "(have resnet18, densenet121)")


def compute_gradcam(model: SmallCNN, params, image: jnp.ndarray,
                    class_idx: Optional[int] = None
                    ) -> Tuple[np.ndarray, int]:
    """CAM for one image ``(H, W, C)`` under the in-framework SmallCNN."""
    def fmap_fn(x):
        _, feats = model.apply(params, x, return_features=True)
        return feats

    def head_fn(f):
        import flax.linen as nn

        pooled = jnp.mean(f, axis=(1, 2))
        dense = nn.Dense(model.num_classes)
        return dense.apply({"params": params["params"]["head"]}, pooled)

    return compute_gradcam_from_fns(fmap_fn, head_fn, image, class_idx)


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


def _save_cam_panels(cam_fn, images, out_dir: str, max_images: int,
                     class_names) -> list:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    images = np.asarray(images)[:max_images]
    for i, img in enumerate(images):
        cam, pred = cam_fn(img)
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


def run_gradcam(model: SmallCNN, params, images, out_dir: str,
                max_images: int = 8, class_names=None) -> list:
    """CAM overlays for a batch under the in-framework SmallCNN -> PNGs
    (capability of ``gradcam.py:66-73``)."""
    return _save_cam_panels(
        lambda img: compute_gradcam(model, params, img),
        images, out_dir, max_images, class_names)


def run_gradcam_backbone(backbone: str, checkpoint: str, images,
                         out_dir: str, max_images: int = 8,
                         class_names=None) -> list:
    """CAM overlays under a PRETRAINED backbone (local checkpoint) — the
    reference's actual explainability path (``gradcam.py:11-15`` CAMs a
    pretrained ResNet18 layer4, not an in-repo classifier)."""
    fmap_fn, head_fn = make_backbone_cam_fns(backbone, checkpoint)
    return _save_cam_panels(
        lambda img: compute_gradcam_from_fns(fmap_fn, head_fn, img),
        images, out_dir, max_images, class_names)
