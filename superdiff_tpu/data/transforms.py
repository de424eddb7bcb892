"""X-ray preprocessing and augmentation — host decode, device math.

Capability surface of the reference's ``src/transforms.py``:
- resize strategies ``pad`` (short-side resize + center crop),
  ``center_crop``, ``resize`` (``src/transforms.py:31-44``),
- optional CLAHE histogram equalization (cv2, clipLimit 2.0, 8x8 tiles,
  ``src/transforms.py:8-13``),
- normalization modes ``minmax`` (per-image rescale), ``zscore``
  (mean .5 / std .25), ``tanh`` (x*2-1), ``none``
  (``src/transforms.py:15-29``),
- risk-tiered augmentation ``none``/``low``/``medium``; ``high``
  deliberately raises ("Avoid high-risk medical augmentations",
  ``src/transforms.py:59-98``).

TPU-first split: geometry that depends on per-image aspect ratio (resize
strategy) and CLAHE run on the host at decode time (cheap next to JPEG
decode, and dynamic-shaped); everything stochastic or batched — flips,
rotations, brightness/contrast, noise, normalization — runs **on device**,
vectorized over the batch with per-example PRNG keys, replacing
albumentations' per-sample CPU loop. Parity with albumentations is
distributional, not pixel-exact (SURVEY.md §7.3 hard part #3).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

RISK_TIERS = ("none", "low", "medium")
NORMALIZATIONS = ("minmax", "zscore", "tanh", "none")
RESIZE_STRATEGIES = ("pad", "center_crop", "resize")


# --------------------------------------------------------------- host side --

def host_resize(pil_img, resolution: int, strategy: str = "pad"):
    """Apply the resize strategy to a PIL image -> (R, R) uint8 array."""
    from PIL import Image

    if strategy not in RESIZE_STRATEGIES:
        raise ValueError(f"unknown resize strategy {strategy!r} "
                         f"(have {RESIZE_STRATEGIES})")
    w, h = pil_img.size
    if strategy == "resize":
        out = pil_img.resize((resolution, resolution), Image.BILINEAR)
    else:
        if strategy == "pad":
            # short side -> resolution, preserving aspect, then center crop
            scale = resolution / min(w, h)
            pil_img = pil_img.resize((max(resolution, round(w * scale)),
                                      max(resolution, round(h * scale))),
                                     Image.BILINEAR)
            w, h = pil_img.size
        left = max(0, (w - resolution) // 2)
        top = max(0, (h - resolution) // 2)
        out = pil_img.crop((left, top, left + resolution, top + resolution))
        if out.size != (resolution, resolution):  # center_crop on small img
            out = out.resize((resolution, resolution), Image.BILINEAR)
    return np.asarray(out, dtype=np.uint8)


def clahe(img_uint8: np.ndarray, clip_limit: float = 2.0,
          tile_grid: int = 8) -> np.ndarray:
    """CLAHE histogram equalization (host, cv2) — reference defaults."""
    import cv2

    c = cv2.createCLAHE(clipLimit=clip_limit,
                        tileGridSize=(tile_grid, tile_grid))
    return c.apply(img_uint8)


# ------------------------------------------------------------- device side --

def normalize(batch: jnp.ndarray, mode: str = "tanh") -> jnp.ndarray:
    """Normalize a float [0,1] NHWC batch per the named mode."""
    if mode == "minmax":
        lo = jnp.min(batch, axis=(1, 2, 3), keepdims=True)
        hi = jnp.max(batch, axis=(1, 2, 3), keepdims=True)
        return (batch - lo) / jnp.maximum(hi - lo, 1e-6)
    if mode == "zscore":
        return (batch - 0.5) / 0.25
    if mode == "tanh":
        return batch * 2.0 - 1.0
    if mode == "none":
        return batch
    raise ValueError(f"unknown normalization {mode!r} "
                     f"(have {NORMALIZATIONS})")


def denormalize(batch: jnp.ndarray, mode: str = "tanh") -> jnp.ndarray:
    """Inverse of :func:`normalize` back to [0,1] (minmax is lossy; clip)."""
    if mode == "zscore":
        return jnp.clip(batch * 0.25 + 0.5, 0.0, 1.0)
    if mode == "tanh":
        return jnp.clip((batch + 1.0) * 0.5, 0.0, 1.0)
    return jnp.clip(batch, 0.0, 1.0)


def _shift1d(img: jnp.ndarray, off: jnp.ndarray, axis: int,
             max_shift: int) -> jnp.ndarray:
    """Fractional per-row shift along ``axis`` (edge-clamped, bilinear).

    TPU-native: a 2-hot hat-weight contraction over ``2*max_shift + 1``
    statically sliced copies of the edge-padded image — slices + one
    einsum, NO gather (XLA's gather runs off the vector units and made
    the rotation ~107 ms/step at 256² batch 32; this path measures
    ~31 ms at the medium tier's bounds, ~4.3×).

    ``img``: (B, H, W, C); ``off``: the per-(batch, row) sample offset —
    (B, H) for ``axis=2``, (B, W) for ``axis=1`` — i.e. output[x] samples
    input[x - off]. |off| must be <= max_shift (a static tier bound).
    """
    pad = [(0, 0)] * img.ndim
    pad[axis] = (max_shift, max_shift)
    padded = jnp.pad(img, pad, mode="edge")
    size = img.shape[axis]
    stack = jnp.stack([
        jax.lax.slice_in_dim(padded, d, d + size, axis=axis)
        for d in range(2 * max_shift + 1)])              # (S, B, H, W, C)
    shifts = jnp.arange(-max_shift, max_shift + 1, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(off[..., None] + shifts))
    # HIGHEST precision: the TPU default lowers f32 dots to bf16 multiplies,
    # which would quantize EVERY image ~3x per step (including angle-0 ones
    # — the whole batch flows through the shears); the contraction is only
    # 2*max_shift+1 long, so full f32 costs nothing measurable.
    prec = jax.lax.Precision.HIGHEST
    if axis == 2:
        return jnp.einsum("sbhwc,bhs->bhwc", stack, w, precision=prec)
    return jnp.einsum("sbhwc,bws->bhwc", stack, w, precision=prec)


def _rotate_shear3(batch: jnp.ndarray, angles: jnp.ndarray,
                   max_deg: float) -> jnp.ndarray:
    """Batched center rotation as three 1-D shears (Paeth): x, y, x.

    Exact affine map, three separable bilinear resamples — matches the
    direct bilinear `_rotate_bilinear` to ~2.5e-3 max on smooth images
    (pinned by tests; white noise decorrelates at 1 px, so pointwise
    comparison there is meaningless). ``max_deg`` is the static tier
    bound that sizes the shift stacks.
    """
    H, W = batch.shape[1], batch.shape[2]
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    ty = jnp.tan(angles / 2.0)
    sn = jnp.sin(angles)
    ybar = jnp.arange(H, dtype=jnp.float32) - cy
    xbar = jnp.arange(W, dtype=jnp.float32) - cx
    maxr = np.deg2rad(max_deg)
    Dx = int(np.ceil(np.tan(maxr / 2.0) * max(cy, cx))) + 1
    Dy = int(np.ceil(np.sin(maxr) * max(cy, cx))) + 1
    offx = -ty[:, None] * ybar[None, :]                  # (B, H)
    out = _shift1d(batch, offx, axis=2, max_shift=Dx)
    out = _shift1d(out, sn[:, None] * xbar[None, :], axis=1, max_shift=Dy)
    return _shift1d(out, offx, axis=2, max_shift=Dx)


def _rotate_bilinear(img: jnp.ndarray, angle_rad: jnp.ndarray) -> jnp.ndarray:
    """Rotate one (H, W, C) image about its center, bilinear, edge-clamped.

    Direct gather implementation (jax.scipy map_coordinates) — the
    semantic reference for `_rotate_shear3`, which the augmentation
    pipeline actually dispatches (gathers are slow on TPU)."""
    H, W = img.shape[0], img.shape[1]
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy = jnp.arange(H, dtype=jnp.float32)[:, None] - cy
    xx = jnp.arange(W, dtype=jnp.float32)[None, :] - cx
    cos, sin = jnp.cos(angle_rad), jnp.sin(angle_rad)
    src_y = cy + yy * cos - xx * sin
    src_x = cx + yy * sin + xx * cos
    coords = jnp.stack([
        jnp.broadcast_to(src_y, (H, W)),
        jnp.broadcast_to(src_x, (H, W)),
    ])

    def sample_channel(ch):
        return jax.scipy.ndimage.map_coordinates(ch, list(coords), order=1,
                                                 mode="nearest")

    return jnp.stack([sample_channel(img[:, :, c])
                      for c in range(img.shape[2])], axis=-1)


@functools.partial(jax.jit, static_argnames=("risk",))
def augment(batch: jnp.ndarray, rng: jax.Array,
            risk: str = "low") -> jnp.ndarray:
    """Risk-tiered stochastic augmentation of a float [0,1] NHWC batch.

    Vectorized over the batch with independent per-example randomness; the
    tier probabilities/magnitudes mirror the reference's albumentations
    pipelines (``src/transforms.py:61-96``).
    """
    if risk == "high":
        raise ValueError("Avoid high-risk medical augmentations")
    if risk not in RISK_TIERS:
        raise ValueError(f"unknown augmentation risk {risk!r} "
                         f"(have {RISK_TIERS + ('high',)})")
    if risk == "none":
        return batch

    B = batch.shape[0]
    keys = jax.random.split(rng, 6)

    # horizontal flip, p=0.5 (both tiers)
    do_flip = jax.random.bernoulli(keys[0], 0.5, (B, 1, 1, 1))
    batch = jnp.where(do_flip, batch[:, :, ::-1, :], batch)

    # rotation: low = +-5 deg p=0.5 ; medium = +-15 deg p=1.0
    max_deg = 5.0 if risk == "low" else 15.0
    rot_p = 0.5 if risk == "low" else 1.0
    angles = jax.random.uniform(keys[1], (B,), minval=-max_deg,
                                maxval=max_deg) * (jnp.pi / 180.0)
    do_rot = jax.random.bernoulli(keys[2], rot_p, (B,))
    angles = jnp.where(do_rot, angles, 0.0)
    batch = _rotate_shear3(batch, angles, max_deg)

    # brightness/contrast: low p=0.3, medium p=0.4; +-0.2 each
    bc_p = 0.3 if risk == "low" else 0.4
    do_bc = jax.random.bernoulli(keys[3], bc_p, (B, 1, 1, 1))
    bright, contrast = jnp.split(
        jax.random.uniform(keys[4], (B, 2, 1, 1, 1), minval=-0.2,
                           maxval=0.2), 2, axis=1)
    adjusted = jnp.clip(
        (batch - 0.5) * (1.0 + contrast[:, 0]) + 0.5 + bright[:, 0],
        0.0, 1.0)
    batch = jnp.where(do_bc, adjusted, batch)

    if risk == "low":
        # gaussian noise p=0.2, sigma ~ U[0.01, 0.05]
        k_noise, k_p, k_sig = jax.random.split(keys[5], 3)
        do_noise = jax.random.bernoulli(k_p, 0.2, (B, 1, 1, 1))
        sigma = jax.random.uniform(k_sig, (B, 1, 1, 1), minval=0.01,
                                   maxval=0.05)
        noise = jax.random.normal(k_noise, batch.shape) * sigma
        batch = jnp.where(do_noise, jnp.clip(batch + noise, 0.0, 1.0),
                          batch)
    return batch


def prepare_batch(images_uint8: jnp.ndarray, rng: Optional[jax.Array],
                  augmentation: str = "low",
                  normalization: str = "tanh") -> jnp.ndarray:
    """uint8 NHWC host batch -> augmented, normalized float32 device batch.

    The single device-side entry the training pipeline uses; everything in
    here fuses into the surrounding jit (one HBM round trip).
    """
    x = images_uint8.astype(jnp.float32) / 255.0
    if augmentation != "none" and rng is not None:
        x = augment(x, rng, risk=augmentation)
    return normalize(x, normalization)
