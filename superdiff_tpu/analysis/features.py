"""Feature extraction for latent analysis (projections, FID, Grad-CAM).

Capability of ``src/models/feature_extractor.py`` — which wraps *downloaded*
pretrained nets (ResNet18 ``:8-16``, CheXNet DenseNet121 ``:35-46``,
BiomedCLIP ``:48-51``). This environment (and many TPU pods) has no network
egress, so the rebuilt interface is backend-pluggable:

- ``"diffusion"`` — bottleneck activations of a *trained diffusion UNet* at
  a fixed timestep, the framework-native choice (the denoiser has learned
  exactly the domain statistics the projections are meant to show);
- ``"classifier"`` — a small in-framework CNN classifier (also the
  Grad-CAM target, mirroring the reference's classifier-based CAM);
- ``"random"`` — fixed-seed random-projection CNN (no weights needed; the
  classic random-features baseline for t-SNE/UMAP sanity views);
- ``"resnet18"`` — a locally saved torchvision-style ResNet18 checkpoint
  run as pure JAX on the accelerator (``analysis/resnet.py``), enabling
  standard-FID the moment weights are available (no egress needed at
  runtime);
- ``"densenet121"`` — same for DenseNet121 (``analysis/densenet.py``) —
  the reference's CheXNet path (torchxrayvision checkpoints keep
  torchvision key naming, so a locally saved ``densenet121-res224-all``
  state dict loads directly, 1024-d pooled features);
- ``"hf"`` — a *local* HuggingFace vision checkpoint dir (the BiomedCLIP
  vision-tower path, ``feature_extractor.py:48-51``; save once with
  ``save_pretrained()`` where egress exists, point ``checkpoint=`` at it);
- ``"torch"`` — optional escape hatch for arbitrary local torch callables.

All extractors expose ``extract(images_nhwc) -> (B, D) float32`` and batch
through one jitted apply (``extract_features`` handles batching/limits as
the reference's ``extract_features(..., max_samples=300)`` did, ``:18-33``).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from superdiff_tpu.models.layers import num_groups_for


class SmallCNN(nn.Module):
    """Compact classifier: conv pyramid -> GAP -> logits.

    Doubles as (a) the "classifier" feature extractor and (b) the Grad-CAM
    target network. ``features()`` exposes the last conv map, the analogue
    of the reference's ResNet ``layer4`` hook (``src/visualization/
    gradcam.py:11-15``).
    """
    num_classes: int = 2
    widths: Tuple[int, ...] = (32, 64, 128)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, return_features: bool = False):
        h = x
        for i, w in enumerate(self.widths):
            h = nn.Conv(w, (3, 3), strides=(2, 2), name=f"conv_{i}")(h)
            h = nn.GroupNorm(num_groups=num_groups_for(w, 8),
                             name=f"norm_{i}")(h)
            h = nn.silu(h)
        feats = h                                  # (B, h, w, C)
        pooled = jnp.mean(feats, axis=(1, 2))      # (B, C)
        logits = nn.Dense(self.num_classes, name="head")(pooled)
        if return_features:
            return logits, feats
        return logits


class FeatureExtractor:
    """Uniform ``extract(images) -> (B, D)`` facade over the backends."""

    def __init__(self, kind: str = "random",
                 params=None, model=None,
                 schedule=None, timestep: int = 100,
                 seed: int = 0, feature_dim: int = 256,
                 checkpoint: Optional[str] = None):
        self.kind = kind
        if kind in ("resnet18", "densenet121"):
            if kind == "resnet18":
                from superdiff_tpu.analysis.resnet import (
                    load_torch_resnet18 as load_ckpt)
            else:
                from superdiff_tpu.analysis.densenet import (
                    load_torch_densenet121 as load_ckpt)

            if params is None:
                if checkpoint is None:
                    raise ValueError(
                        f"{kind} backend needs checkpoint= (path to a "
                        "torchvision-style state_dict) or params= "
                        "(converted)")
                params = load_ckpt(checkpoint)
            self._params = params
        elif kind == "random":
            self._model = SmallCNN(num_classes=feature_dim)
            self._params = None  # lazily init per input shape
            self._seed = seed
        elif kind == "classifier":
            if params is None and checkpoint is not None:
                model, params = load_classifier(checkpoint)
            if model is None or params is None:
                raise ValueError(
                    "classifier backend needs model + params, or "
                    "checkpoint= (an .npz saved by save_classifier)")
            self._model, self._params = model, params
        elif kind == "diffusion":
            if model is None or params is None or schedule is None:
                raise ValueError(
                    "diffusion backend needs model + params + schedule")
            self._model, self._params = model, params
            self._schedule, self._t = schedule, timestep
        elif kind == "torch":
            if model is None:
                raise ValueError("torch backend needs a callable model")
            self._torch_fn = model
        elif kind == "hf":
            # BiomedCLIP-style vision tower (feature_extractor.py:48-51)
            # from a LOCAL HuggingFace checkpoint dir — no egress: the user
            # saves the model once with save_pretrained() wherever they do
            # have network, and points checkpoint= at it.
            if checkpoint is None:
                raise ValueError(
                    "hf backend needs checkpoint= (a local directory saved "
                    "with save_pretrained())")
            self._torch_fn = _make_hf_vision_fn(checkpoint)
        else:
            raise ValueError(f"unknown extractor kind {kind!r}")
        self._jitted: Optional[Callable] = None

    def _build_fn(self, sample: jnp.ndarray) -> Callable:
        if self.kind == "resnet18":
            from superdiff_tpu.analysis.resnet import resnet18_features

            def fn(x):
                return resnet18_features(self._params, x)
        elif self.kind == "densenet121":
            from superdiff_tpu.analysis.densenet import densenet121_features

            def fn(x):
                return densenet121_features(self._params, x)
        elif self.kind == "random":
            if self._params is None:
                self._params = self._model.init(
                    jax.random.PRNGKey(self._seed), sample)

            def fn(x):
                _, feats = self._model.apply(self._params, x,
                                             return_features=True)
                return jnp.mean(feats, axis=(1, 2))
        elif self.kind == "classifier":
            def fn(x):
                _, feats = self._model.apply(self._params, x,
                                             return_features=True)
                return jnp.mean(feats, axis=(1, 2))
        elif self.kind == "diffusion":
            schedule, t_fix = self._schedule, self._t

            def fn(x):
                B = x.shape[0]
                t = jnp.full((B,), t_fix, dtype=jnp.int32)
                # deterministic probe: noise the input to t and capture the
                # UNet's bottleneck activations
                noise = jax.random.normal(jax.random.PRNGKey(0), x.shape,
                                          dtype=x.dtype)
                from superdiff_tpu.diffusion import q_sample

                xt = q_sample(schedule, x, t, noise)
                conditional = getattr(self._model, "num_classes", 0) > 0
                args = (xt, t)
                if conditional:
                    args = args + (jnp.full((B,), self._model.null_label,
                                            dtype=jnp.int32),)
                _, inter = self._model.apply(
                    self._params, *args, capture_intermediates=True,
                    mutable=["intermediates"])
                feats = _find_bottleneck(inter["intermediates"])
                return jnp.mean(feats, axis=(1, 2)).astype(jnp.float32)
        else:
            raise AssertionError(self.kind)
        return jax.jit(fn)

    def extract(self, images) -> np.ndarray:
        if self.kind in ("torch", "hf"):
            # host-side extractors: never bounce through the accelerator
            return np.asarray(self._torch_fn(np.asarray(images)))
        images = jnp.asarray(images)
        if self._jitted is None:
            self._jitted = self._build_fn(images)
        return np.asarray(self._jitted(images))


def save_classifier(path: str, params, widths: Tuple[int, ...],
                    num_classes: int, meta: Optional[dict] = None) -> None:
    """Persist a trained ``SmallCNN`` as a flat ``.npz`` (no pickle).

    The archive holds one array per parameter leaf (keys are
    '/'-joined param paths) plus a ``__meta__`` JSON string with the
    architecture (``widths``, ``num_classes``) and any caller metadata
    (training accuracy, seed, data root) so a loaded extractor is fully
    self-describing — the trained analogue of the reference's
    downloaded-checkpoint extractors (``src/models/feature_extractor.py``).
    """
    import json

    from flax import traverse_util

    flat = traverse_util.flatten_dict(params, sep="/")
    arrays = {k: np.asarray(v) for k, v in flat.items()}
    info = {"widths": list(widths), "num_classes": int(num_classes)}
    info.update(meta or {})
    arrays["__meta__"] = np.frombuffer(
        json.dumps(info).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_classifier(path: str):
    """Load a ``save_classifier`` archive -> ``(SmallCNN, params)``."""
    import json

    from flax import traverse_util

    with np.load(path) as data:
        arrays = {k: data[k] for k in data.files}
    info = json.loads(bytes(arrays.pop("__meta__").tobytes()).decode())
    params = traverse_util.unflatten_dict(
        {k: jnp.asarray(v) for k, v in arrays.items()}, sep="/")
    model = SmallCNN(num_classes=int(info["num_classes"]),
                     widths=tuple(info["widths"]))
    return model, params


def _make_hf_vision_fn(checkpoint_dir: str):
    """Local HF vision model -> ``(B, H, W, 1) numpy -> (B, D)`` callable.

    Replicates grayscale to the model's expected channels, resizes to its
    configured input size, and returns the pooled output (pooler_output
    when present, else mean over the last hidden state's tokens) — the
    tensor the reference's BiomedCLIP closure exposes.

    When the checkpoint dir also holds a saved image processor
    (``preprocessor_config.json``), its normalization statistics
    (``image_mean``/``image_std``, e.g. the CLIP constants) are applied so
    features are computed on the input distribution the tower was trained
    on: inputs are first min-max rescaled per-image into [0, 1] (our
    pipelines hand over minmax/zscore/tanh-normalized floats, not raw
    pixels), then standardized channelwise. Without a saved processor the
    raw floats pass straight through (previous behavior).
    """
    import torch
    from transformers import AutoModel

    model = AutoModel.from_pretrained(checkpoint_dir,
                                      local_files_only=True).eval()
    size = getattr(model.config, "image_size", 224)
    channels = getattr(model.config, "num_channels", 3)

    mean = std = None
    try:
        from transformers import AutoImageProcessor

        proc = AutoImageProcessor.from_pretrained(checkpoint_dir,
                                                  local_files_only=True)
        if getattr(proc, "image_mean", None) is not None:
            mean = torch.tensor(proc.image_mean,
                                dtype=torch.float32).view(1, -1, 1, 1)
            std = torch.tensor(proc.image_std,
                               dtype=torch.float32).view(1, -1, 1, 1)
        psize = getattr(proc, "size", None)
        if isinstance(psize, dict):
            size = (psize.get("height") or psize.get("shortest_edge")
                    or size)
    except Exception:  # no/unreadable processor config -> raw passthrough
        pass

    @torch.no_grad()
    def fn(images_nhwc: np.ndarray) -> np.ndarray:
        x = torch.from_numpy(
            np.asarray(images_nhwc, dtype=np.float32).transpose(0, 3, 1, 2))
        if x.shape[1] == 1 and channels != 1:
            x = x.repeat(1, channels, 1, 1)
        if x.shape[-1] != size:
            x = torch.nn.functional.interpolate(
                x, size=(size, size), mode="bilinear", align_corners=False)
        if mean is not None:
            lo = x.amin(dim=(1, 2, 3), keepdim=True)
            hi = x.amax(dim=(1, 2, 3), keepdim=True)
            x = (x - lo) / torch.clamp(hi - lo, min=1e-8)
            m = mean if mean.shape[1] == x.shape[1] else mean.mean(
                dim=1, keepdim=True)
            s = std if std.shape[1] == x.shape[1] else std.mean(
                dim=1, keepdim=True)
            x = (x - m) / s
        out = model(pixel_values=x)
        pooled = getattr(out, "pooler_output", None)
        if pooled is None:
            pooled = out.last_hidden_state.mean(dim=1)
        return pooled.numpy()

    return fn


def _find_bottleneck(intermediates: dict):
    """Pull the middle-block output out of captured intermediates."""
    for key in ("mid_attn", "mid_block_1", "mid_block_0", "mid"):
        if key in intermediates:
            node = intermediates[key]
            while isinstance(node, dict):
                node = node.get("__call__", next(iter(node.values())))
            return node[0] if isinstance(node, tuple) else node
    raise KeyError(f"no bottleneck in {list(intermediates)}")


def extract_features(extractor: FeatureExtractor,
                     batches: Iterable,
                     max_samples: int = 300
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Batched extraction with a sample cap (reference semantics:
    ``feature_extractor.py:18-33``). ``batches`` yields dicts with
    ``image`` (+ optional ``label``); returns ``(features, labels)``."""
    feats, labels = [], []
    n = 0
    for batch in batches:
        img = batch["image"] if isinstance(batch, dict) else batch
        feats.append(extractor.extract(img))
        if isinstance(batch, dict) and "label" in batch:
            labels.append(np.asarray(batch["label"]))
        else:
            labels.append(np.zeros(len(img), dtype=np.int32))
        n += len(img)
        if n >= max_samples:
            break
    f = np.concatenate(feats)[:max_samples]
    l = np.concatenate(labels)[:max_samples]
    return f, l
