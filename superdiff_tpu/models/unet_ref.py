"""Parity model: the reference's tiny 5-block time-conditioned CNN, in Flax.

Reproduces ``src/models/unet.py:18-65`` semantics exactly (NHWC instead of
NCHW): despite its name the reference "UNet" has **no** residual connections,
no down/upsampling, no skip concats, no attention and no class conditioning —
it is five [GN -> SiLU -> Conv3x3 -> GN -> SiLU -> Conv3x3] + additive
time-bias blocks at full resolution: 1 -> 64 -> 128 -> 128 -> 64 -> 1.

Kept for (a) fp32 numerical-parity tests against an independent PyTorch
re-derivation of the same math, and (b) cheap smoke-training. The real model
family is :class:`superdiff_tpu.models.unet.CondUNet`.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from superdiff_tpu.models.layers import TimeEmbeddingMLP


class RefResidualBlock(nn.Module):
    """[GN(min(4,ch)) -> SiLU -> Conv3x3] x2, then ``h + Dense(t_emb)``.

    Matches ``src/models/unet.py:18-35`` (including the additive — not
    FiLM — time bias, and the absence of an actual residual skip).
    torch GroupNorm eps is 1e-5, so we pin that here too.
    """
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t_emb: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=min(4, in_ch), epsilon=1e-5,
                         dtype=self.dtype, name="norm_0")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name="conv_0")(h)
        h = nn.GroupNorm(num_groups=min(4, self.out_channels), epsilon=1e-5,
                         dtype=self.dtype, name="norm_1")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name="conv_1")(h)
        bias = nn.Dense(self.out_channels, dtype=self.dtype,
                        name="time_emb")(t_emb)
        return h + bias[:, None, None, :]


class RefUNet(nn.Module):
    """The reference's exact model graph (``src/models/unet.py:38-65``).

    ``parameterization`` declares what the head's output *means* (eps/v/x0,
    consumed by ``inference.make_eps_fn_p`` and the training loss targets);
    it does not change the graph. It exists so imported reference
    checkpoints can be progressively distilled (``cli/distill.py`` trains
    v-headed students warm-started from the eps teacher).
    """
    in_channels: int = 1
    out_channels: int = 1
    time_emb_dim: int = 256
    base_channels: int = 64
    dtype: jnp.dtype = jnp.float32
    parameterization: str = "eps"

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        if self.parameterization not in ("eps", "v", "x0"):
            raise ValueError("parameterization must be eps/v/x0, got "
                             f"{self.parameterization!r}")
        t_emb = TimeEmbeddingMLP(self.time_emb_dim, dtype=self.dtype,
                                 name="time_mlp")(t)
        bc = self.base_channels
        h = RefResidualBlock(bc, dtype=self.dtype, name="down_0")(x, t_emb)
        h = RefResidualBlock(bc * 2, dtype=self.dtype, name="down_1")(h, t_emb)
        h = RefResidualBlock(bc * 2, dtype=self.dtype, name="mid")(h, t_emb)
        h = RefResidualBlock(bc, dtype=self.dtype, name="up_0")(h, t_emb)
        h = RefResidualBlock(self.out_channels, dtype=self.dtype,
                             name="up_1")(h, t_emb)
        return h
