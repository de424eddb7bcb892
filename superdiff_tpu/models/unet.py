"""CondUNet — the flagship class-conditional DDPM UNet (NHWC, bf16-ready).

The capability the reference *declares* ("Class-conditional UNet Diffusion
Models", ``README.md:8``) but never implements (its ``UNet`` takes no label,
``src/models/unet.py:57``). Standard DDPM UNet topology (Ho et al. 2020 /
Improved DDPM):

- stem conv -> ``len(channel_mults)`` resolution levels, ``num_res_blocks``
  FiLM ResBlocks each, stride-2 conv downsampling between levels,
- self-attention at resolutions listed in ``attn_resolutions`` (flash
  attention via the Pallas kernel in ``ops/attention.py``),
- middle: ResBlock -> Attention -> ResBlock,
- mirror-image up path with UNet skip *concatenation*,
- out: GN -> SiLU -> zero-init 3x3 conv.

Conditioning: sinusoidal timestep MLP + learned class embedding, summed.
``num_classes`` labels plus one reserved **null label** (index
``num_classes``) for classifier-free guidance training/sampling.

TPU notes: NHWC everywhere; ``compute_dtype=bfloat16`` runs convs/attention
on the MXU at full rate while params, norms and the conditioning MLP stay
float32. All shapes static; the whole net jits into one XLA program.

``pixel_shuffle > 1`` enables a space-to-depth stem (efficient-UNet style):
the image is losslessly reshaped ``(H, W, C) -> (H/p, W/p, C*p^2)`` before
the stem conv and inverted after the output conv. At 256^2 the top pyramid
level otherwise holds ~60% of the model FLOPs in 64-channel convs that pack
the 128-wide MXU contraction poorly; shuffling by 2 moves that level to
128^2 with 4 input channels — same receptive-field economics, ~2.5x fewer
FLOPs per sample (preset ``eff256``).
"""

from __future__ import annotations

from typing import Sequence, Optional, Union

import jax.numpy as jnp
from flax import linen as nn

from superdiff_tpu.models.layers import (
    TimeEmbeddingMLP, ResBlock, SelfAttention2D, Downsample, Upsample,
    num_groups_for)


class CondUNet(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    base_channels: int = 64
    channel_mults: Sequence[int] = (1, 2, 2, 4)
    num_res_blocks: Union[int, Sequence[int]] = 2
                                   # int -> same count at every level; a
                                   # per-level tuple (len(channel_mults))
                                   # concentrates capacity where it is
                                   # cheap: the profile (BASELINE.md r3)
                                   # shows 62% of the flagship step runs at
                                   # >=128² shapes, so e.g. (1, 2, 2, 2, 2)
                                   # halves the dominant level's ResBlocks
                                   # while the 32²/16²/8² levels keep full
                                   # depth. Up path mirrors with +1 per
                                   # level as usual.
    attn_resolutions: Sequence[int] = (16, 8)
    up_attn_resolutions: Optional[Sequence[int]] = None
                                   # None -> mirror attn_resolutions in the
                                   # up path. A narrower set (e.g. attn256d:
                                   # 32² attention down+mid only) cuts the
                                   # up path's num_res_blocks+1 attention
                                   # calls per level — the up path sees the
                                   # skip-injected context anyway, so this
                                   # trades little quality for the dominant
                                   # share of the attention cost.
    num_heads: int = 4
    num_classes: int = 0           # 0 => unconditional
    time_emb_dim: int = 256
    dropout: float = 0.0
    compute_dtype: jnp.dtype = jnp.float32
    groups: int = 32
    pixel_shuffle: int = 1
    norm_dtype: jnp.dtype = jnp.float32  # inference-time lever: bf16 norms
                                         # halve norm-pass HBM traffic (stats
                                         # still reduce in f32); params stay
                                         # f32 so checkpoints are unchanged
    parameterization: str = "eps"  # what the head predicts: eps|v|x0.
                                   # Metadata only — the graph (and thus
                                   # every checkpoint) is identical across
                                   # the three; consumers convert via
                                   # diffusion.process.eps_from_pred
                                   # (arXiv:2202.00512 §2.4 for v)
    remat: bool = False            # rematerialize each ResBlock/attention in
                                   # the backward pass (jax.checkpoint via
                                   # nn.remat): activation memory drops to
                                   # ~one block's worth per level at the
                                   # cost of a second forward — the
                                   # standard TPU lever for training
                                   # larger batches/models than HBM holds.
                                   # Param structure and forward numerics
                                   # are unchanged (parity tests).

    @property
    def null_label(self) -> int:
        """Label index meaning "unconditional" (classifier-free guidance)."""
        return self.num_classes

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray], t: Optional[jnp.ndarray],
                 y: Optional[jnp.ndarray] = None,
                 deterministic: bool = True,
                 stage: str = "all",
                 pp_state=None) -> jnp.ndarray:
        """Full forward (``stage="all"``), or one pipeline stage.

        ``stage="down"`` runs embeddings + stem + down path and returns the
        pipeline payload ``(h, skips, emb)``; ``stage="up"`` consumes that
        payload (as ``pp_state``; ``x``/``t``/``y`` may be None) and runs
        mid + up + out. Both stage paths create modules with exactly the
        names the full path creates, so one trained checkpoint splits into
        per-stage parameter subsets by top-level name
        (``parallel/pp.py::split_params``) — pipeline parallelism without
        a separate checkpoint format.
        """
        if stage not in ("all", "down", "up"):
            raise ValueError(f"stage must be all/down/up, got {stage!r}")
        if self.parameterization not in ("eps", "v", "x0"):
            raise ValueError("parameterization must be eps/v/x0, got "
                             f"{self.parameterization!r}")
        cd = self.compute_dtype
        p = self.pixel_shuffle

        if self.remat:
            # nn.remat counts the module as arg 0, so deterministic (a
            # concrete bool consumed by nn.Dropout) is arg 3
            Res = nn.remat(ResBlock, static_argnums=(3,))
            Attn = nn.remat(SelfAttention2D)
        else:
            Res, Attn = ResBlock, SelfAttention2D

        n_levels = len(self.channel_mults)
        if isinstance(self.num_res_blocks, int):
            blocks_per_level = (self.num_res_blocks,) * n_levels
        else:
            blocks_per_level = tuple(self.num_res_blocks)
            if len(blocks_per_level) != n_levels:
                raise ValueError(
                    f"num_res_blocks has {len(blocks_per_level)} entries "
                    f"for {n_levels} levels (channel_mults="
                    f"{tuple(self.channel_mults)})")

        if stage == "up":
            if pp_state is None:
                raise ValueError('stage="up" requires pp_state='
                                 '(h, skips, emb) from stage="down"')
            h, skips, emb = pp_state
            skips = list(skips)
            resolution = h.shape[1]
        else:
            emb_dim = self.time_emb_dim * 4
            emb = TimeEmbeddingMLP(self.time_emb_dim, out_dim=emb_dim,
                                   name="time_mlp")(t)
            if self.num_classes > 0:
                if y is None:
                    raise ValueError(
                        "CondUNet(num_classes>0) requires labels y; pass "
                        "y=full(null_label) for unconditional use.")
                emb = emb + nn.Embed(self.num_classes + 1, emb_dim,
                                     name="class_emb")(y)

            if p > 1:
                x = space_to_depth(x, p)
            h = nn.Conv(self.base_channels, (3, 3), dtype=cd,
                        name="stem")(x.astype(cd))

            resolution = x.shape[1]
            skips = [h]
            # --- down path ---
            for level, mult in enumerate(self.channel_mults):
                ch = self.base_channels * mult
                for block in range(blocks_per_level[level]):
                    h = Res(ch, compute_dtype=cd, groups=self.groups,
                                 norm_dtype=self.norm_dtype,
                                 dropout=self.dropout,
                                 name=f"down_{level}_block_{block}")(
                                     h, emb, deterministic)
                    if resolution in self.attn_resolutions:
                        h = Attn(
                            self.num_heads, compute_dtype=cd,
                            norm_dtype=self.norm_dtype,
                            name=f"down_{level}_attn_{block}")(h)
                    skips.append(h)
                if level != len(self.channel_mults) - 1:
                    h = Downsample(compute_dtype=cd,
                                   name=f"down_{level}_downsample")(h)
                    resolution //= 2
                    skips.append(h)
            if stage == "down":
                return h, tuple(skips), emb

        # --- middle ---
        mid_ch = self.base_channels * self.channel_mults[-1]
        h = Res(mid_ch, compute_dtype=cd, groups=self.groups,
                     norm_dtype=self.norm_dtype,
                     dropout=self.dropout, name="mid_block_0")(
                         h, emb, deterministic)
        h = Attn(self.num_heads, compute_dtype=cd,
                                        norm_dtype=self.norm_dtype,
                            name="mid_attn")(h)
        h = Res(mid_ch, compute_dtype=cd, groups=self.groups,
                     norm_dtype=self.norm_dtype,
                     dropout=self.dropout, name="mid_block_1")(
                         h, emb, deterministic)

        # --- up path (skip concat) ---
        up_attn = (self.attn_resolutions if self.up_attn_resolutions is None
                   else self.up_attn_resolutions)
        for level, mult in reversed(list(enumerate(self.channel_mults))):
            ch = self.base_channels * mult
            for block in range(blocks_per_level[level] + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip.astype(cd)], axis=-1)
                h = Res(ch, compute_dtype=cd, groups=self.groups,
                             norm_dtype=self.norm_dtype,
                             dropout=self.dropout,
                             name=f"up_{level}_block_{block}")(
                                 h, emb, deterministic)
                if resolution in up_attn:
                    h = Attn(self.num_heads, compute_dtype=cd,
                                        norm_dtype=self.norm_dtype,
                                        name=f"up_{level}_attn_{block}")(h)
            if level != 0:
                h = Upsample(compute_dtype=cd,
                             name=f"up_{level}_upsample")(h)
                resolution *= 2
        assert not skips

        g_out = num_groups_for(h.shape[-1], self.groups)
        h = nn.GroupNorm(num_groups=g_out, epsilon=1e-5,
                         dtype=self.norm_dtype, name="out_norm")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels * p * p, (3, 3), dtype=jnp.float32,
                    kernel_init=nn.initializers.zeros, name="out_conv")(h)
        if p > 1:
            h = depth_to_space(h, p)
        return h


def space_to_depth(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """Lossless ``(B, H, W, C) -> (B, H/p, W/p, C*p*p)`` rearrangement."""
    B, H, W, C = x.shape
    if H % p or W % p:
        raise ValueError(f"resolution {(H, W)} not divisible by {p}")
    x = x.reshape(B, H // p, p, W // p, p, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // p, W // p,
                                                 p * p * C)


def depth_to_space(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    B, H, W, PC = x.shape
    C = PC // (p * p)
    x = x.reshape(B, H, W, p, p, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * p, W * p, C)
