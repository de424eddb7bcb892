"""Import the reference's trained PyTorch checkpoints into this framework.

The reference trains for days on the Wits cluster and saves two artifacts
per epoch — ``ddpm_epoch{N}.pt`` and ``ema_epoch{N}.pt``, both plain
``UNet.state_dict()`` dumps (``src/train/training_logic.py:47-48``; the
EMA file is ``ema.ema_model.state_dict()``, so both share one key layout)
— but ships **no code path that ever loads one** (SURVEY.md §5.4). This
module closes the migration gap: it maps those state dicts onto
:class:`superdiff_tpu.models.unet_ref.RefUNet` (the graph-parity model,
``src/models/unet.py:18-65``) and writes an exported inference artifact
(``config.yaml`` + ``ema_params.npz``, the ``cli/export.py`` format), so
a reference user's existing trained models flow straight into
``cli/{sample,evaluate,serve,visualize}`` and SuperDiff superposition on
TPU.

Layout conversions (PyTorch -> Flax):
- ``nn.Linear.weight (out, in)``    -> ``Dense.kernel (in, out)``
- ``nn.Conv2d.weight (O, I, kh, kw)`` -> ``Conv.kernel (kh, kw, I, O)``
- ``nn.GroupNorm.weight/bias``      -> ``GroupNorm.scale/bias``

The architecture (base_channels, time_emb_dim, in/out channels) is
inferred from tensor shapes, so non-default ``UNet(...)`` constructions
import too.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

# reference module path -> RefUNet submodule name
# (``src/models/unet.py:47-55``: downs/mid/ups ModuleLists)
REF_BLOCKS: Tuple[Tuple[str, str], ...] = (
    ("downs.0", "down_0"),
    ("downs.1", "down_1"),
    ("mid", "mid"),
    ("ups.0", "up_0"),
    ("ups.1", "up_1"),
)

# wrapper prefixes seen in the wild: DataParallel, ema-pytorch's EMA
# object saved whole (training_logic.py saves ema.ema_model, but users
# also torch.save(ema.state_dict()) — those keys carry ema_model.)
_STRIP_PREFIXES = ("module.", "ema_model.", "online_model.")


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):       # torch tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def normalize_state_dict(sd: Dict) -> Dict[str, np.ndarray]:
    """Strip wrapper prefixes, drop non-tensor bookkeeping entries
    (ema-pytorch's ``initted``/``step``), convert tensors to numpy.

    A whole-EMA-object save (``torch.save(ema.state_dict())`` with
    ema-pytorch's default ``include_online_model=True``) carries BOTH
    ``ema_model.*`` and ``online_model.*`` weight sets; stripping both into
    one key space would let dict order silently decide which survives. The
    EMA weights are the deliverable the reference samples from
    (``training_logic.py:55``), so when both are present only ``ema_model.*``
    is imported."""
    keys = list(sd)
    if (any(k.startswith("ema_model.") for k in keys)
            and any(k.startswith("online_model.") for k in keys)):
        sd = {k: v for k, v in sd.items()
              if not k.startswith("online_model.")}
    out = {}
    for k, v in sd.items():
        for pre in _STRIP_PREFIXES:
            if k.startswith(pre):
                k = k[len(pre):]
                break
        if k in ("initted", "step"):
            continue
        out[k] = _to_numpy(v)
    return out


def infer_ref_arch(sd: Dict[str, np.ndarray]) -> Dict[str, int]:
    """Read the UNet constructor args back out of the tensor shapes."""
    try:
        w_mlp0 = sd["time_mlp.1.weight"]        # (4*dim, dim)
        w_in = sd["downs.0.block.2.weight"]     # (base, in_ch, 3, 3)
        w_out = sd["ups.1.block.5.weight"]      # (out_ch, out_ch, 3, 3)
    except KeyError as e:
        raise ValueError(
            f"state dict is missing reference-UNet key {e} — is this a "
            "ddpm_epochN.pt / ema_epochN.pt from the reference trainer? "
            f"(got keys like {sorted(sd)[:4]})")
    return dict(time_emb_dim=int(w_mlp0.shape[1]),
                base_channels=int(w_in.shape[0]),
                in_channels=int(w_in.shape[1]),
                out_channels=int(w_out.shape[0]))


def _dense(sd, key):
    return {"kernel": sd[f"{key}.weight"].T,
            "bias": sd[f"{key}.bias"]}


def _conv(sd, key):
    return {"kernel": sd[f"{key}.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"{key}.bias"]}


def _norm(sd, key):
    return {"scale": sd[f"{key}.weight"],
            "bias": sd[f"{key}.bias"]}


def ref_params_from_state_dict(sd: Dict) -> Dict:
    """Reference ``UNet.state_dict()`` -> RefUNet param pytree
    (``{"params": {...}}``), fp32."""
    sd = normalize_state_dict(sd)
    infer_ref_arch(sd)  # validates key layout with a useful error
    params = {
        "time_mlp": {"dense_0": _dense(sd, "time_mlp.1"),
                     "dense_1": _dense(sd, "time_mlp.3")},
    }
    for torch_name, flax_name in REF_BLOCKS:
        params[flax_name] = {
            "norm_0": _norm(sd, f"{torch_name}.block.0"),
            "conv_0": _conv(sd, f"{torch_name}.block.2"),
            "norm_1": _norm(sd, f"{torch_name}.block.3"),
            "conv_1": _conv(sd, f"{torch_name}.block.5"),
            "time_emb": _dense(sd, f"{torch_name}.time_emb"),
        }
    return {"params": params}


def import_checkpoint(checkpoint: str,
                      out_dir: str,
                      resolution: int = 256,
                      num_timesteps: int = 1000,
                      beta_start: float = 1e-4,
                      beta_end: float = 0.02,
                      normalization: str = "tanh",
                      task: str = "TB") -> Dict[str, int]:
    """Convert one reference ``.pt`` into an inference artifact dir.

    Defaults mirror the reference's training workload (linear betas
    1e-4 -> 0.02, T=1000, 256² — ``src/models/ddpm.py:7-9``,
    ``src/transforms.py:74``); pass the run's actual values if its config
    differed. Returns the inferred architecture dict.
    """
    import torch

    from superdiff_tpu.cli.export import export_params
    from superdiff_tpu.config import Config, save_config

    try:
        sd = torch.load(checkpoint, map_location="cpu", weights_only=True)
    except TypeError:  # older torch without weights_only
        sd = torch.load(checkpoint, map_location="cpu")
    if not isinstance(sd, dict):
        raise ValueError(f"{checkpoint} does not hold a state_dict "
                         f"(got {type(sd).__name__})")
    sd = normalize_state_dict(sd)
    arch = infer_ref_arch(sd)
    if (arch["in_channels"], arch["out_channels"]) != (1, 1):
        raise ValueError(f"expected grayscale 1->1 UNet, got {arch}")
    params = ref_params_from_state_dict(sd)

    cfg = Config()
    cfg.task = task
    cfg.model.preset = "ref"
    cfg.model.conditional = False
    cfg.model.compute_dtype = "float32"   # the parity graph runs fp32
    cfg.model.norm_dtype = "float32"
    cfg.model.base_channels = arch["base_channels"]
    cfg.training.resolution = resolution
    cfg.training.num_timesteps = num_timesteps
    cfg.training.schedule = "linear"
    cfg.training.beta_start = beta_start
    cfg.training.beta_end = beta_end
    cfg.training.normalization = normalization
    if arch["time_emb_dim"] != 256:
        # RefUNet pins the reference default; config carries no field for
        # it, so reject loudly rather than rebuild a wrong graph later
        raise ValueError(
            f"time_emb_dim {arch['time_emb_dim']} != 256: the reference "
            "trainer always builds UNet() with defaults (src/train.py) — "
            "a custom graph needs a matching RefUNet/time_emb_dim field")

    # shape-check against a freshly initialized RefUNet before writing:
    # a silently mis-shaped import would otherwise fail at first apply
    import jax
    import jax.numpy as jnp

    from superdiff_tpu.models.presets import model_from_config
    from superdiff_tpu.utils.env import host_init

    model = model_from_config(cfg)
    x = jnp.zeros((1, resolution, resolution, 1))
    t0 = jnp.zeros((1,), dtype=jnp.int32)
    want = host_init(model.init, jax.random.PRNGKey(0), x, t0)
    flat_want = jax.tree_util.tree_map(lambda a: a.shape, want)
    flat_got = jax.tree_util.tree_map(lambda a: a.shape, params)
    if flat_want != flat_got:
        raise ValueError(
            "imported parameter shapes do not match RefUNet "
            f"(base_channels={arch['base_channels']}):\n"
            f"want {flat_want}\ngot  {flat_got}")

    os.makedirs(out_dir, exist_ok=True)
    save_config(cfg, os.path.join(out_dir, "config.yaml"))
    export_params(params, os.path.join(out_dir, "ema_params.npz"))
    return arch
