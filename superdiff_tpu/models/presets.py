"""Named model presets for the supported resolutions.

The driver's north-star configs (BASELINE.json) sample at 64², 128² and
256²; these presets pin the UNet topology per resolution so CLIs, benches
and checkpoints agree on shapes. The reference has a single hard-coded tiny
CNN (``src/models/unet.py:38``) — preset "ref" reproduces it.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from superdiff_tpu.models.unet import CondUNet
from superdiff_tpu.models.unet_ref import RefUNet

# topology per working resolution: deeper pyramids for larger images so the
# bottleneck (and attention) lands at 8-16 px.
_PRESETS: Dict[str, Dict[str, Any]] = {
    "small64": dict(base_channels=64, channel_mults=(1, 2, 2, 4),
                    num_res_blocks=2, attn_resolutions=(16, 8),
                    num_heads=4),
    "base128": dict(base_channels=64, channel_mults=(1, 1, 2, 2, 4),
                    num_res_blocks=2, attn_resolutions=(16, 8),
                    num_heads=4),
    "base256": dict(base_channels=64, channel_mults=(1, 1, 2, 2, 4, 4),
                    num_res_blocks=2, attn_resolutions=(16,),
                    num_heads=4),
    # TPU-efficient 256² flagship: space-to-depth stem moves the top level
    # to 128² x 4ch — the plain-conv 256² level packs the 128-wide MXU
    # contraction at <50% and holds ~60% of base256's FLOPs. ~2.5x fewer
    # FLOPs per sample at equal pyramid depth below 128².
    "eff256": dict(base_channels=64, channel_mults=(1, 2, 2, 4, 4),
                   num_res_blocks=2, attn_resolutions=(16,),
                   num_heads=4, pixel_shuffle=2),
    # Max-throughput 256² variant: shuffle by 4 (top level 64² x 16ch).
    # More aggressive than common practice — prefer eff256 unless sampling
    # throughput dominates quality requirements.
    "fast256": dict(base_channels=64, channel_mults=(1, 2, 4, 4),
                    num_res_blocks=2, attn_resolutions=(16,),
                    num_heads=4, pixel_shuffle=4),
    # eff256 + self-attention also at 32² (S=1024 flattened tokens): the
    # higher-capacity 256² variant. The 32² attention runs through the
    # Pallas flash kernel by default (ops/attention.py crossover at
    # S>=1024); measured on v5e the mixed flash/XLA policy gives
    # 1.173 samples/sec vs 1.133 pure-XLA — the extra attention level
    # costs ~28% throughput vs eff256 (BASELINE.md A/B table).
    "attn256": dict(base_channels=64, channel_mults=(1, 2, 2, 4, 4),
                    num_res_blocks=2, attn_resolutions=(32, 16),
                    num_heads=4, pixel_shuffle=2),
    # fast256 topology (4x shuffle, 64² top level) + attn256d's attention
    # policy (32² flash attention down+mid, 16² everywhere): the profile
    # (artifacts/profile/profile_attn256d.json) shows 62% of attn256d's
    # step lives at its 128² level where C=64 half-fills the 128-lane VPU
    # tiles; shuffling that level away cuts it 4x. Measured: 4.44
    # samples/sec (2.6x the flagship) but shared-extractor FID 13.0 vs
    # the flagship's 6.54 — the 4x shuffle costs real detail quality, so
    # this is the max-throughput preset, NOT the flagship (BASELINE.md
    # 256² A/B).
    "fastattn256": dict(base_channels=64, channel_mults=(1, 2, 4, 4),
                        num_res_blocks=2, attn_resolutions=(32, 16),
                        up_attn_resolutions=(16,),
                        num_heads=4, pixel_shuffle=4),
    # THE 256² FLAGSHIP (round 3): attn256 with the 32² attention in the
    # DOWN path + mid only — keeps the long-range mixing where the
    # representation is built, drops the up path's 3 S=1024 calls (which
    # see skip-injected context anyway). Measured: best FID of all 256²
    # presets under the shared fixed extractor (6.537 vs attn256 6.551 /
    # eff256 6.802, 120ep TB) at 1.689 samples/sec DDPM-1000 — both the
    # quality and the >=1.5 samples/sec bar (BASELINE.md round-3 tables).
    "attn256d": dict(base_channels=64, channel_mults=(1, 2, 2, 4, 4),
                     num_res_blocks=2, attn_resolutions=(32, 16),
                     up_attn_resolutions=(16,),
                     num_heads=4, pixel_shuffle=2),
    # attn256d with a slim top level: one ResBlock (instead of two) at the
    # 128² C=64 level the round-3 xplane profile indicts (52% of the step
    # is norm-chain HBM traffic, 62% of device time at >=128² shapes —
    # BASELINE.md). Unlike fastattn256's 4x shuffle this keeps the level,
    # just halves its norm passes. Measured: 2.05 samples/sec (+21%) but
    # shared-extractor FID 7.05 vs the flagship's 6.54 — superseded by
    # slim256 below, which is faster AND scored better; kept because
    # trained artifacts reference it (config snapshots must rebuild the
    # exact architecture).
    "attn256s": dict(base_channels=64, channel_mults=(1, 2, 2, 4, 4),
                     num_res_blocks=(1, 2, 2, 2, 2),
                     attn_resolutions=(32, 16),
                     up_attn_resolutions=(16,),
                     num_heads=4, pixel_shuffle=2),
    # THE 256² speed/quality middle point: slim at 128² AND 64². Measured
    # (BASELINE.md round-3 slim sweep + quality A/B): 2.21 samples/sec
    # DDPM-1000 (+31% over the flagship) at shared-extractor FID 6.94 vs
    # the flagship's 6.54 — for throughput-leaning deployments where
    # fastattn256's FID 13.0 is too coarse. The flagship attn256d keeps
    # full depth and the best FID.
    "slim256": dict(base_channels=64, channel_mults=(1, 2, 2, 4, 4),
                    num_res_blocks=(1, 1, 2, 2, 2),
                    attn_resolutions=(32, 16),
                    up_attn_resolutions=(16,),
                    num_heads=4, pixel_shuffle=2),
    # THE 256² FLAGSHIP (round 4). The round-3 xplane profile attributed
    # attn256d's 52% norm-chain slice to C=64 half-filling the (8, 128)
    # lane tiles at the 128² level; this preset answers with CHANNEL
    # WIDTH: C=128 at 128² (lane-full norm tiles), one ResBlock there to
    # offset the 4x conv FLOPs, deep levels unchanged — 38.6 M params,
    # attn256d's attention policy. Measured (BASELINE.md round 4,
    # scripts/bench_r4_width.py): runs 47% MORE FLOPs 4.6% FASTER than
    # attn256d (1.768 vs 1.690 samples/sec DDPM-1000, MFU 45.6% -> 70.2%)
    # AND wins quality decisively under both shared extractors at 512
    # samples (proj-FID 5.67 vs 6.14, conv-FID 7645 vs 11675, 120ep TB
    # protocol) — more capacity at the indicted level, faster execution.
    "wide256": dict(base_channels=128, channel_mults=(1, 1, 1, 2, 2),
                    num_res_blocks=(1, 2, 2, 2, 2),
                    attn_resolutions=(32, 16),
                    up_attn_resolutions=(16,),
                    num_heads=4, pixel_shuffle=2),
}

# 256² default = the round-4 flagship wide256: best FID of all measured
# 256² presets under BOTH shared extractors at 512 samples (proj 5.67 /
# conv 7645 vs attn256d's 6.14 / 11675) AND faster (1.768 vs 1.690
# samples/sec DDPM-1000, 70% MFU — BASELINE.md round-4 width section).
# eff256 (1.853) and fast256 (3.8+) remain the pure-throughput points;
# attn256d stays the round-3 flagship for trained-artifact rebuilds.
RESOLUTION_TO_PRESET = {64: "small64", 128: "base128", 256: "wide256"}


def build_model(preset: str = "small64",
                num_classes: int = 2,
                compute_dtype=jnp.bfloat16,
                **overrides) -> CondUNet:
    """Build a flagship CondUNet from a named preset (+ field overrides)."""
    if preset == "ref":
        # the parity model takes only its own graph fields (conditioning /
        # dtype-policy knobs don't exist on the reference graph); imported
        # reference checkpoints may override base_channels etc.
        # parameterization is head *metadata*, not graph — it must survive
        # the rebuild or v-distilled ref students get read as eps models.
        ref_fields = {k: v for k, v in overrides.items()
                      if k in ("in_channels", "out_channels",
                               "time_emb_dim", "base_channels",
                               "parameterization")}
        return RefUNet(**ref_fields)
    if preset not in _PRESETS:
        raise ValueError(
            f"unknown preset {preset!r} (have {['ref'] + sorted(_PRESETS)})")
    cfg = dict(_PRESETS[preset])
    cfg.update(overrides)
    return CondUNet(num_classes=num_classes, compute_dtype=compute_dtype,
                    **cfg)


def model_from_config(cfg) -> CondUNet:
    """Build the model a :class:`~superdiff_tpu.config.Config` describes —
    the single source of truth shared by training, sampling and analysis
    (a config snapshot must always rebuild the exact architecture that was
    trained, or checkpoints fail to restore)."""
    import jax.numpy as jnp

    overrides = {}
    if cfg.model.base_channels:
        overrides["base_channels"] = cfg.model.base_channels
    nrb = getattr(cfg.model, "num_res_blocks", None)
    if nrb:
        # one entry -> uniform int; several -> per-level tuple (CondUNet
        # validates the length against the preset's channel_mults)
        overrides["num_res_blocks"] = nrb[0] if len(nrb) == 1 else tuple(nrb)
    ar = getattr(cfg.model, "attn_resolutions", None)
    if ar:
        # down+mid attention placement only; the preset's up-path policy
        # (up_attn_resolutions) is deliberately kept — matches the
        # flagship's measured down+mid-only policy (presets.py attn256d).
        overrides["attn_resolutions"] = tuple(ar)
    dtypes = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}
    nd = getattr(cfg.model, "norm_dtype", "float32")
    if nd not in dtypes or cfg.model.compute_dtype not in dtypes:
        raise ValueError("model.compute_dtype / model.norm_dtype must be "
                         f"one of {sorted(dtypes)}")
    if nd != "float32":
        overrides["norm_dtype"] = dtypes[nd]
    pz = getattr(cfg.model, "parameterization", "eps")
    if pz != "eps":
        overrides["parameterization"] = pz
    if getattr(cfg.model, "remat", False):
        overrides["remat"] = True
    return build_model(
        cfg.model.preset,
        num_classes=cfg.model.num_classes if cfg.model.conditional else 0,
        compute_dtype=dtypes[cfg.model.compute_dtype],
        dropout=cfg.model.dropout,
        **overrides)


def preset_for_resolution(resolution: int) -> str:
    if resolution not in RESOLUTION_TO_PRESET:
        raise ValueError(f"no preset for resolution {resolution} "
                         f"(have {sorted(RESOLUTION_TO_PRESET)})")
    return RESOLUTION_TO_PRESET[resolution]
