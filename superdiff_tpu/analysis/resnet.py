"""TPU-side ResNet18 feature extractor from torchvision-style checkpoints.

Capability of ``src/models/feature_extractor.py:8-16`` (ResNet18, conv1
swapped to 1 channel, fc dropped) — without downloading anything: this
module loads a *locally saved* torchvision-format ``state_dict`` (the file a
user with egress gets from ``torch.save(resnet18(weights=...).state_dict())``)
and runs the network as a pure JAX function on the TPU, so standard-FID
features come off the accelerator, not host torch.

Design notes (inference-only, hence no flax module/state machinery):
- parameters live in a plain nested dict converted once from the torch
  state dict (OIHW -> HWIO, NCHW -> NHWC semantics),
- BatchNorm is applied in inference form from the checkpoint's running
  statistics,
- the 3-channel conv1 is adapted to grayscale by summing kernels over RGB
  (exactly equivalent to feeding the gray image replicated to 3 channels;
  the reference instead re-initializes conv1 untrained, losing pretrained
  stem features),
- feature output is the 512-d global-average pool before ``fc``
  (the reference sets ``model.fc = nn.Identity()``).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# torchvision resnet18 topology: (blocks per layer, channels, first stride)
_LAYERS = (("layer1", 2, 64, 1), ("layer2", 2, 128, 2),
           ("layer3", 2, 256, 2), ("layer4", 2, 512, 2))


def convert_torch_resnet18(state_dict, grayscale: bool = True) -> Dict:
    """torchvision ``state_dict`` (tensors or numpy) -> JAX param tree.

    ``grayscale=True`` performs the 1-channel conv1 surgery by summing the
    RGB kernel axes. Validates presence/shapes of every expected key so a
    wrong checkpoint fails loudly, not with NaN features.
    """
    def arr(key, expect_ndim=None):
        if key not in state_dict:
            raise KeyError(f"checkpoint missing {key!r} — not a "
                           "torchvision resnet18 state_dict?")
        v = state_dict[key]
        v = np.asarray(v.detach().cpu().numpy()
                       if hasattr(v, "detach") else v)
        if expect_ndim is not None and v.ndim != expect_ndim:
            raise ValueError(f"{key}: expected {expect_ndim}D, "
                             f"got shape {v.shape}")
        return v

    def conv(key):
        w = arr(key, 4)                       # OIHW
        return jnp.asarray(w.transpose(2, 3, 1, 0))   # HWIO

    def bn(prefix):
        return {
            "scale": jnp.asarray(arr(f"{prefix}.weight", 1)),
            "bias": jnp.asarray(arr(f"{prefix}.bias", 1)),
            "mean": jnp.asarray(arr(f"{prefix}.running_mean", 1)),
            "var": jnp.asarray(arr(f"{prefix}.running_var", 1)),
        }

    w1 = conv("conv1.weight")                 # (7, 7, C_in, 64)
    if grayscale and w1.shape[2] == 3:
        w1 = jnp.sum(w1, axis=2, keepdims=True)
    params: Dict = {"conv1": w1, "bn1": bn("bn1")}
    for name, blocks, _, _ in _LAYERS:
        layer = []
        for b in range(blocks):
            p = f"{name}.{b}"
            blk = {"conv1": conv(f"{p}.conv1.weight"),
                   "bn1": bn(f"{p}.bn1"),
                   "conv2": conv(f"{p}.conv2.weight"),
                   "bn2": bn(f"{p}.bn2")}
            if f"{p}.downsample.0.weight" in state_dict:
                blk["down_conv"] = conv(f"{p}.downsample.0.weight")
                blk["down_bn"] = bn(f"{p}.downsample.1")
            layer.append(blk)
        params[name] = layer
    if "fc.weight" in state_dict:
        # keep the classifier head when the checkpoint has one — Grad-CAM
        # differentiates a logit of THIS head w.r.t. the layer4 map, the
        # reference's target (src/visualization/gradcam.py:11-15)
        params["fc"] = {"kernel": jnp.asarray(arr("fc.weight", 2).T),
                        "bias": jnp.asarray(arr("fc.bias", 1))}
    return params


def load_torch_resnet18(path: str, grayscale: bool = True) -> Dict:
    """Load + convert a locally saved torchvision resnet18 state dict.

    Accepts ``torch.save``d state dicts (requires torch) or ``.npz``
    archives with the same key names (no torch needed).
    """
    if path.endswith(".npz"):
        return convert_torch_resnet18(dict(np.load(path)), grayscale)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_torch_resnet18(sd, grayscale)


def _bn(x, p, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * (inv * p["scale"]) + p["bias"]


def _conv(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _basic_block(x, blk, stride):
    h = jax.nn.relu(_bn(_conv(x, blk["conv1"], stride, 1), blk["bn1"]))
    h = _bn(_conv(h, blk["conv2"], 1, 1), blk["bn2"])
    if "down_conv" in blk:
        x = _bn(_conv(x, blk["down_conv"], stride, 0), blk["down_bn"])
    return jax.nn.relu(h + x)


def resnet18_feature_map(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """``(B, H, W, 1) -> (B, h, w, 512)`` — the layer4 output BEFORE the
    global pool: the reference's Grad-CAM hook target
    (``src/visualization/gradcam.py:15`` hooks ``model.layer4``)."""
    h = jax.nn.relu(_bn(_conv(x, params["conv1"], 2, 3), params["bn1"]))
    h = jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    for name, _, _, stride in _LAYERS:
        for b, blk in enumerate(params[name]):
            h = _basic_block(h, blk, stride if b == 0 else 1)
    return h


def resnet18_features(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """``(B, H, W, 1) -> (B, 512)`` pooled features (pre-fc), pure JAX.

    Matches torchvision's resnet18 graph: 7x7/2 stem, 3x3/2 maxpool, four
    2-block stages, global average pool.
    """
    return jnp.mean(resnet18_feature_map(params, x), axis=(1, 2))


def resnet18_logits(params: Dict, feature_map: jnp.ndarray) -> jnp.ndarray:
    """Classifier head on a layer4 feature map: global average pool + fc.
    Requires a checkpoint converted WITH its ``fc`` (see
    :func:`convert_torch_resnet18`)."""
    if "fc" not in params:
        raise KeyError("checkpoint was converted without its fc head — "
                       "Grad-CAM needs the classifier logits")
    pooled = jnp.mean(feature_map, axis=(1, 2))
    return pooled @ params["fc"]["kernel"] + params["fc"]["bias"]
