"""TPU-side DenseNet121 feature extractor from torchvision-style checkpoints.

Capability of ``src/models/feature_extractor.py:35-46`` — the reference's
CheXNet path (torchxrayvision ``densenet121-res224-all``, pooled 1024-d
features) — without downloading anything: loads a *locally saved*
torchvision-format DenseNet121 ``state_dict`` and runs the network as a pure
JAX function on the TPU. torchxrayvision's DenseNet keeps torchvision's
``features.*`` key naming, so its checkpoints convert the same way; its
grayscale (1-channel) ``conv0`` is accepted as-is, while an RGB checkpoint
gets the kernel-sum surgery (equivalent to replicating the gray input).

Same design stance as ``analysis/resnet.py``: inference-only plain param
dict (OIHW→HWIO), BatchNorm in running-stats form, features = global
average pool of ``relu(norm5)`` (1024-d for DenseNet121) — exactly the
tensor the reference's closure exposes.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# DenseNet121: growth 32, stem 64, dense blocks of (6, 12, 24, 16) layers
_BLOCK_CONFIG = (6, 12, 24, 16)


def convert_torch_densenet121(state_dict, grayscale: bool = True) -> Dict:
    """torchvision/xrv DenseNet121 ``state_dict`` -> JAX param tree.

    Validates presence/shape of every expected key so a wrong checkpoint
    fails loudly, not with NaN features.
    """
    def arr(key, expect_ndim=None):
        if key not in state_dict:
            raise KeyError(f"checkpoint missing {key!r} — not a "
                           "torchvision densenet121 state_dict?")
        v = state_dict[key]
        v = np.asarray(v.detach().cpu().numpy()
                       if hasattr(v, "detach") else v)
        if expect_ndim is not None and v.ndim != expect_ndim:
            raise ValueError(f"{key}: expected {expect_ndim}D, "
                             f"got shape {v.shape}")
        return v

    def conv(key):
        w = arr(key, 4)                                # OIHW
        return jnp.asarray(w.transpose(2, 3, 1, 0))    # HWIO

    def bn(prefix):
        return {
            "scale": jnp.asarray(arr(f"{prefix}.weight", 1)),
            "bias": jnp.asarray(arr(f"{prefix}.bias", 1)),
            "mean": jnp.asarray(arr(f"{prefix}.running_mean", 1)),
            "var": jnp.asarray(arr(f"{prefix}.running_var", 1)),
        }

    w0 = conv("features.conv0.weight")                 # (7, 7, C_in, 64)
    if grayscale and w0.shape[2] == 3:
        w0 = jnp.sum(w0, axis=2, keepdims=True)
    params: Dict = {"conv0": w0, "norm0": bn("features.norm0")}
    for i, n_layers in enumerate(_BLOCK_CONFIG, start=1):
        block = []
        for j in range(1, n_layers + 1):
            p = f"features.denseblock{i}.denselayer{j}"
            block.append({"norm1": bn(f"{p}.norm1"),
                          "conv1": conv(f"{p}.conv1.weight"),
                          "norm2": bn(f"{p}.norm2"),
                          "conv2": conv(f"{p}.conv2.weight")})
        params[f"block{i}"] = block
        if i < len(_BLOCK_CONFIG):
            t = f"features.transition{i}"
            params[f"transition{i}"] = {"norm": bn(f"{t}.norm"),
                                        "conv": conv(f"{t}.conv.weight")}
    params["norm5"] = bn("features.norm5")
    if "classifier.weight" in state_dict:
        # keep the classifier head when present (torchvision/CheXNet
        # checkpoints ship one) — Grad-CAM targets its logits
        params["classifier"] = {
            "kernel": jnp.asarray(arr("classifier.weight", 2).T),
            "bias": jnp.asarray(arr("classifier.bias", 1))}
    return params


def load_torch_densenet121(path: str, grayscale: bool = True) -> Dict:
    """Load + convert a locally saved DenseNet121 state dict (``torch.save``d
    file, or an ``.npz`` with the same key names — no torch needed)."""
    if path.endswith(".npz"):
        return convert_torch_densenet121(dict(np.load(path)), grayscale)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_torch_densenet121(sd, grayscale)


def _bn(x, p, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * (inv * p["scale"]) + p["bias"]


def _conv(x, w, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _dense_layer(x, p):
    h = _conv(jax.nn.relu(_bn(x, p["norm1"])), p["conv1"])       # 1x1
    h = _conv(jax.nn.relu(_bn(h, p["norm2"])), p["conv2"],
              padding=1)                                         # 3x3
    return jnp.concatenate([x, h], axis=-1)


def densenet121_feature_map(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """``(B, H, W, 1) -> (B, h, w, 1024)`` — ``relu(norm5)`` BEFORE the
    global pool, the DenseNet Grad-CAM target (last conv features)."""
    h = jax.nn.relu(_bn(_conv(x, params["conv0"], 2, 3), params["norm0"]))
    h = jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    for i in range(1, len(_BLOCK_CONFIG) + 1):
        for layer in params[f"block{i}"]:
            h = _dense_layer(h, layer)
        if i < len(_BLOCK_CONFIG):
            t = params[f"transition{i}"]
            h = _conv(jax.nn.relu(_bn(h, t["norm"])), t["conv"])
            h = jax.lax.reduce_window(
                h, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID") / 4.0
    return jax.nn.relu(_bn(h, params["norm5"]))


def densenet121_features(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """``(B, H, W, 1) -> (B, 1024)`` pooled features, pure JAX.

    Matches torchvision's DenseNet121 graph: 7x7/2 stem + BN/ReLU + 3x3/2
    maxpool, four dense blocks with 2x2 average-pool transitions, then
    ``relu(norm5)`` and global average pooling — the feature tensor the
    reference's CheXNet closure returns.
    """
    return jnp.mean(densenet121_feature_map(params, x), axis=(1, 2))


def densenet121_logits(params: Dict, feature_map: jnp.ndarray
                       ) -> jnp.ndarray:
    """Classifier head on a feature map: global average pool + classifier.
    Requires a checkpoint converted WITH its ``classifier`` head."""
    if "classifier" not in params:
        raise KeyError("checkpoint was converted without its classifier "
                       "head — Grad-CAM needs the logits")
    pooled = jnp.mean(feature_map, axis=(1, 2))
    return (pooled @ params["classifier"]["kernel"]
            + params["classifier"]["bias"])
