"""Typed configuration tree: YAML-loadable, dotted-path CLI overridable.

Replaces the reference's split-brain config (flat ``src/config/backup.yml``
vs a gitignored nested live schema, plus argparse mutation of the raw dict —
SURVEY.md §5.6). One dataclass tree covers the union of both schemas:

- ``training.{batch_size, num_epochs, num_timesteps, augmentation,
  normalization, split, ...}``  (reference: ``src/train.py:69-95``)
- ``logging.{use_wandb, use_tensorboard}`` (``src/train.py:31-32``)
- ``paths.{cluster_base, local_base, dataset_subdir, output_dir,
  checkpoint_dir, tensorboard_dir, wandb_dir}`` (``src/utils/env.py:19-28``)
- dataset/task/experiment_id/run_id CLI surface (``src/train.py:16-23``)
- the viz toggle block (``src/config/backup.yml:13-24``)
- new: ``model``, ``sampling``, ``superdiff`` sections for the extended
  capability surface.

Booleans parse from strings case-insensitively ("false"/"0"/"no" are falsy)
— the reference compares lowercased strings (``src/train.py:31-32``); here
it is one typed coercion path.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, Dict, List, Optional, Tuple

import yaml


def _coerce(value: Any, typ: Any) -> Any:
    """Coerce a YAML/CLI value to the annotated field type."""
    import typing

    origin = typing.get_origin(typ)
    if origin is typing.Union:  # Optional[...]
        args = [a for a in typing.get_args(typ) if a is not type(None)]
        if value is None:
            return None
        return _coerce(value, args[0])
    if typ is bool:
        if isinstance(value, bool):
            return value
        if isinstance(value, (int, float)):
            return bool(value)
        return str(value).strip().lower() not in ("false", "0", "no", "off",
                                                  "none", "")
    if typ is int:
        return int(value)
    if typ is float:
        return float(value)
    if typ is str:
        return str(value)
    if origin in (tuple, Tuple):
        args = typing.get_args(typ)
        elt = args[0] if args else str
        if isinstance(value, str):
            value = [v for v in value.replace(",", " ").split() if v]
        elif not isinstance(value, (list, tuple)):
            value = [value]             # scalar -> 1-tuple (e.g. "=3")
        return tuple(_coerce(v, elt) for v in value)
    if origin in (list, List):
        args = typing.get_args(typ)
        elt = args[0] if args else str
        if isinstance(value, str):
            value = [v for v in value.replace(",", " ").split() if v]
        return [_coerce(v, elt) for v in value]
    return value


@dataclass
class TrainingConfig:
    batch_size: int = 8                 # backup.yml:7
    num_epochs: int = 100               # backup.yml:8
    num_timesteps: int = 1000           # backup.yml:9
    schedule: str = "linear"            # + cosine (extension)
    beta_start: float = 1e-4
    beta_end: float = 0.02
    augmentation: str = "low"           # none|low|medium (high -> error)
    normalization: str = "tanh"         # minmax|zscore|tanh|none
    split: str = "train"
    resolution: int = 64
    resize_strategy: str = "pad"        # pad|center_crop|resize
    histogram_equalization: bool = False
    learning_rate: float = 2e-4         # training_logic.py:15
    grad_accum: int = 1                 # microbatches per optimizer update
    weight_decay: float = 0.0
    grad_clip_norm: Optional[float] = None
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    ema_decay: float = 0.995            # training_logic.py:16
    loss_type: str = "mse"
    loss_weighting: str = "none"       # none | min_snr (arXiv:2303.09556)
    min_snr_gamma: float = 5.0
    cfg_drop_prob: float = 0.1
    class_filter: Optional[int] = None  # train.py:77 uses 1
    log_every: int = 1                  # epochs, training_logic.py:43
    vis_every: int = 5                  # epochs, training_logic.py:50
    save_every: int = 1                 # epochs (reference saves each epoch)
    eval_every: int = 1                 # epochs between val-split passes
                                        # (0 disables; best-val checkpoint
                                        # kept in <checkpoint_dir>_best)
    eval_batches: Optional[int] = None  # cap val batches per pass
    keep_checkpoints: int = 3
    seed: int = 42                      # train.py:48
    num_epochs_warmstart: int = 0
    steps_per_epoch: Optional[int] = None  # cap (for smoke runs)
    use_native_loader: bool = True      # C++ shard cache when buildable


@dataclass
class ModelConfig:
    preset: str = "small64"
    num_classes: int = 2
    conditional: bool = True
    compute_dtype: str = "bfloat16"     # bfloat16|float32
    # norm-pass dtype for TRAINING (sampling always applies the bf16
    # policy via inference.apply_sampling_policy): bf16 halves the
    # HBM traffic of the GroupNorm chains fwd+bwd — measured +13%
    # train-step throughput at grad cosine 1.0 / rel-L2 6e-6 vs f32
    # (the convs consume bf16 either way, so the norm chain's extra
    # rounding vanishes at the conv input cast; scripts/bench_r3_train.py,
    # BASELINE.md). Params/optimizer/EMA stay f32 and GN statistics
    # still reduce in f32. Set "float32" for exact round-2 numerics.
    norm_dtype: str = "bfloat16"        # bfloat16|float32
    base_channels: Optional[int] = None  # preset overrides
    # Optional preset override: ResBlock count, either one int (uniform,
    # pass "2") or one per pyramid level ("1,2,2,2,2" — must match the
    # preset's channel_mults length). Per-level counts slim the expensive
    # top levels where the round-3 profile puts 52% of the step
    # (BASELINE.md); None keeps the preset's value.
    num_res_blocks: Optional[Tuple[int, ...]] = None
    # Optional preset override: feature-map sides (post pixel-shuffle) that
    # get self-attention in the down path + mid ("64,32,16" puts S=4096
    # full-image-scale attention at the 64-per-side level — the regime
    # where the Pallas flash bwd measured 2x XLA, BASELINE.md round-4
    # long-seq ledger; only the fused kernel makes that trainable at
    # production batch). The preset's up-path policy is unchanged. None
    # keeps the preset's value.
    attn_resolutions: Optional[Tuple[int, ...]] = None
    dropout: float = 0.0
    # Rematerialize ResBlocks/attention in the backward pass
    # (jax.checkpoint): ~num_res_blocks x less activation HBM during
    # training for one extra forward — enables batches/models past HBM.
    # Grad parity with remat off is pinned in tests/test_models.py.
    remat: bool = False
    # What the network head predicts: eps (reference semantics,
    # src/models/ddpm.py:20-24), v (Salimans & Ho 2022, arXiv:2202.00512 —
    # stays well-conditioned at few sampler steps; required teacher form
    # for progressive distillation), or x0. Samplers consume eps; non-eps
    # heads are converted per call (diffusion.process.eps_from_pred).
    parameterization: str = "eps"       # eps|v|x0


@dataclass
class SamplingConfig:
    method: str = "ddpm"                # ddpm|ddim
    num_steps: int = 1000
    eta: float = 0.0
    guidance_scale: float = 1.0
    batch_size: int = 8
    num_batches: int = 1
    clip_x0: bool = True
    label: Optional[int] = None         # None -> unconditional/null
    # DDIM grid spacing: "leading" (t_0 = T - T//steps, the classic grid)
    # or "trailing" (t_0 = T-1 — required for progressively distilled
    # students, whose phases train on trailing grids; see
    # diffusion/samplers.trailing_timesteps). cli/distill.py stamps
    # "trailing" into each student's exported config; the sample/evaluate
    # CLIs honor it via --spacing auto.
    t_spacing: str = "leading"          # leading|trailing


@dataclass
class SuperDiffConfig:
    mode: str = "or"                    # or|and|fixed
    temperature: float = 1.0
    kappa: Tuple[float, ...] = (0.5, 0.5)
    bias: Tuple[float, ...] = (0.0, 0.0)


@dataclass
class LoggingConfig:
    use_wandb: bool = False             # train.py:52
    use_tensorboard: bool = False       # train.py:58
    use_jsonl: bool = True
    stdout: bool = True
    wandb_project: str = "super-diff-xray"  # train.py:53
    profile_steps: int = 0              # >0: jax.profiler trace of N early
                                        # steps into <output>/profile/


@dataclass
class PathsConfig:
    cluster_base: str = "/datasets/cluster"   # env.py:19-20 semantics
    local_base: str = "data"
    dataset_subdir: str = "chest_xray"
    output_dir: str = "outputs"
    checkpoint_dir: str = "checkpoints"
    tensorboard_dir: str = "tensorboard"
    wandb_dir: str = "wandb"


@dataclass
class VizConfig:
    """Toggle block mirroring ``src/config/backup.yml:13-24``."""
    show_class_counts: bool = False
    show_batch: bool = False
    show_augmented: bool = False
    tsne: bool = False
    tsne_thumbnails: bool = False
    tsne_umap_thumbnails: bool = False
    projection_3d: bool = False
    projection_3d_thumbnails: bool = False
    projection_3d_plotly: bool = False
    gradcam: bool = False
    histograms: bool = False
    image_grid: bool = False


@dataclass
class Config:
    task: str = "PNEUMONIA"             # TB|PNEUMONIA (train.py:20)
    dataset: str = "PNEUMONIA"
    experiment_id: str = "exp0"
    run_id: str = "run0"
    training: TrainingConfig = field(default_factory=TrainingConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    sampling: SamplingConfig = field(default_factory=SamplingConfig)
    superdiff: SuperDiffConfig = field(default_factory=SuperDiffConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)
    paths: PathsConfig = field(default_factory=PathsConfig)
    viz: VizConfig = field(default_factory=VizConfig)


def _update_dataclass(obj: Any, data: Dict[str, Any], path: str = "") -> None:
    valid = {f.name: f for f in fields(obj)}
    for key, value in data.items():
        if key not in valid:
            raise KeyError(f"unknown config key: {path}{key}")
        f = valid[key]
        current = getattr(obj, key)
        if is_dataclass(current) and isinstance(value, dict):
            _update_dataclass(current, value, path=f"{path}{key}.")
        else:
            setattr(obj, key, _coerce(value, _resolve_type(obj, f)))


def _resolve_type(obj: Any, f) -> Any:
    import typing
    hints = typing.get_type_hints(type(obj))
    return hints[f.name]


def load_config(yaml_path: Optional[str] = None,
                overrides: Optional[List[str]] = None) -> Config:
    """Build a Config from an optional YAML file plus ``key.path=value``
    override strings (CLI surface)."""
    cfg = Config()
    if yaml_path:
        with open(yaml_path) as fh:
            data = yaml.safe_load(fh) or {}
        _update_dataclass(cfg, data)
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"override must be key.path=value, got {ov!r}")
        key, value = ov.split("=", 1)
        parts = key.strip().split(".")
        node: Dict[str, Any] = {}
        leaf = node
        for p in parts[:-1]:
            leaf[p] = {}
            leaf = leaf[p]
        leaf[parts[-1]] = yaml.safe_load(value)
        _update_dataclass(cfg, node)
    return cfg


def to_dict(cfg: Any) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def save_config(cfg: Config, path: str) -> None:
    """Snapshot the effective config next to the run artifacts (the
    reference dumps its merged config into the checkpoint dir,
    ``src/train.py:44-46``)."""
    with open(path, "w") as fh:
        yaml.safe_dump(to_dict(cfg), fh, sort_keys=False)
