"""Run-directory loading and epsilon-function construction for sampling.

The bridge between training artifacts (config snapshot + Orbax checkpoints)
and the samplers. The reference has no equivalent — its sampling module is
an empty file and nothing ever loads its checkpoints (SURVEY.md §2.3, §5.4).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from superdiff_tpu.checkpoint import CheckpointManager
from superdiff_tpu.config import Config, load_config
from superdiff_tpu.diffusion import make_schedule
from superdiff_tpu.diffusion.schedules import DiffusionSchedule
from superdiff_tpu.models.presets import model_from_config
from superdiff_tpu.training.state import create_train_state, make_optimizer


# Parameter subtrees that stay float32 under the sampling dtype policy:
# normalization scales/biases (applied in the f32 stats path), the
# conditioning MLPs (tiny, run once per step at f32), and the zero-init
# output conv (f32 by model dtype).
_F32_NAME_TOKENS = ("norm", "time_mlp", "class_emb", "emb_proj", "out_conv")


def cast_sampling_params(params, dtype=jnp.bfloat16):
    """Cast the MXU-facing weights (conv / attention / dense kernels that the
    model consumes in ``compute_dtype``) to ``dtype`` once, host-side.

    Inside a sampler's ``lax.scan`` the f32->bf16 weight converts otherwise
    re-read the full f32 parameter set from HBM every step (~150 MB for the
    256² flagship); casting once outside the scan halves that traffic. Leaves
    the model consumes at float32 (see ``_F32_NAME_TOKENS``) are untouched,
    so numerics of the f32 sub-paths are bit-identical.
    """
    def _cast(path, leaf):
        names = [str(getattr(p, "key", "")) for p in path]
        if any(tok in n for n in names for tok in _F32_NAME_TOKENS):
            return leaf
        if leaf.dtype == jnp.float32:
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(_cast, params)


def inference_model(model):
    """Clone ``model`` with the inference dtype policy (bfloat16 norm passes;
    flax still reduces the statistics in float32). No-op for models without
    the knob (RefUNet) or when ``SUPERDIFF_TPU_SAMPLE_F32`` is set."""
    if os.environ.get("SUPERDIFF_TPU_SAMPLE_F32"):
        return model
    if hasattr(model, "norm_dtype"):
        return model.clone(norm_dtype=jnp.bfloat16)
    return model


def apply_sampling_policy(model, params):
    """The production sampling configuration: bf16 norm passes + one-time
    bf16 weight cast. Measured on a v5e chip (scripts/bench_r3_variants.py,
    BASELINE.md round-3 table): eff256 DDPM-1000 1.60 -> 1.84 samples/sec,
    attn256 1.18 -> 1.28. Opt out with ``SUPERDIFF_TPU_SAMPLE_F32=1``
    (exact f32 norm numerics)."""
    if os.environ.get("SUPERDIFF_TPU_SAMPLE_F32"):
        return model, params
    return inference_model(model), cast_sampling_params(params)


def load_run(run_dir: str, step: Optional[int] = None, best: bool = False
             ) -> Tuple[Config, object, DiffusionSchedule, dict]:
    """Load ``(cfg, model, schedule, ema_params)`` from a training run dir
    (``config.yaml`` + ``checkpoints/``) or from an exported inference
    artifact (``config.yaml`` + ``ema_params.npz``, see ``cli/export.py``).

    ``best=True`` loads from the best-validation checkpoint the training
    loop tags (``<checkpoint_dir>_best``) instead of the latest step.
    """
    cfg_path = os.path.join(run_dir, "config.yaml")
    if not os.path.exists(cfg_path):
        raise FileNotFoundError(f"no config.yaml in {run_dir}")
    cfg = load_config(cfg_path)
    t = cfg.training
    schedule = make_schedule(t.num_timesteps, kind=t.schedule,
                             beta_start=t.beta_start, beta_end=t.beta_end)
    model = model_from_config(cfg)

    export_path = os.path.join(run_dir, "ema_params.npz")
    ckpt_dir = os.path.join(run_dir, cfg.paths.checkpoint_dir)
    if best:
        best_dir = ckpt_dir + "_best"
        if not os.path.isdir(best_dir):
            raise FileNotFoundError(
                f"no best-val checkpoint in {run_dir} (train with "
                "training.eval_every > 0 to tag one)")
        ckpt_dir = best_dir
    if os.path.exists(export_path) and not os.path.isdir(ckpt_dir):
        if step is not None:
            raise ValueError(
                f"{run_dir} is an exported inference artifact holding one "
                "snapshot; --step is only meaningful on a training run dir")
        from superdiff_tpu.cli.export import load_exported_params

        ema = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype=jnp.float32),
            load_exported_params(export_path))
        return cfg, model, schedule, ema

    B, R = 1, t.resolution
    x0 = jnp.zeros((B, R, R, 1))
    t0 = jnp.zeros((B,), dtype=jnp.int32)
    args = ((x0, t0, jnp.zeros((B,), dtype=jnp.int32))
            if cfg.model.conditional else (x0, t0))
    state = create_train_state(model, jax.random.PRNGKey(0), args,
                               tx=make_optimizer())
    mngr = CheckpointManager(ckpt_dir)
    state = mngr.restore(state, step=step)
    return cfg, model, schedule, state.ema_params


def resolve_sampler_spec(cfg: Config,
                         method: Optional[str] = None,
                         num_steps: Optional[int] = None,
                         spacing: str = "auto",
                         allowed=("ddpm", "ddim", "dpmpp"),
                         fallback: str = "ddpm"):
    """The ONE place a run's stamped sampling block meets CLI overrides.

    ``cli/distill.py`` stamps ``sampling.{method,num_steps,t_spacing,
    clip_x0}`` into each exported student so default invocations sample on
    the exact grid/transition the student trained for; sample/evaluate/
    serve all resolve through here instead of re-implementing the dance
    (their accept lists had already drifted).

    Explicit CLI values always win. With ``method=None`` the stamp is
    adopted when it names a sampler in ``allowed`` (and its stamped
    ``num_steps`` with it, except for ddpm which always runs full T);
    otherwise ``fallback`` applies and the stamp's step count is ignored
    (the config default is ddpm/1000 — adopting those steps would silently
    change a caller's protocol). ``spacing="auto"`` reads the stamped
    ``t_spacing``. Returns ``(method, num_steps, t_spacing, clip_x0)``
    with ``num_steps`` possibly None — callers apply their own per-method
    protocol defaults (evaluate's FID protocol is DDIM-100, sample's
    default is DDIM-50).
    """
    scfg = getattr(cfg, "sampling", None)
    if method is None:
        stamped = getattr(scfg, "method", None)
        if stamped in allowed:
            method = stamped
            if num_steps is None and method != "ddpm":
                num_steps = getattr(scfg, "num_steps", None)
        else:
            method = fallback
    if spacing in (None, "auto"):
        spacing = getattr(scfg, "t_spacing", "leading")
    clip_x0 = bool(getattr(scfg, "clip_x0", True))
    return method, num_steps, spacing, clip_x0


def check_superpose_compat(cfg: Config, cfg2: Config) -> None:
    """Raise unless two runs share the diffusion process.

    SuperDiff converts each model's eps to a score via run 1's sigmas; a
    second model trained under a different beta schedule (or T, or
    resolution) would get mathematically wrong log-densities and mixing.
    """
    t, t2 = cfg.training, cfg2.training
    if t2.num_timesteps != t.num_timesteps:
        raise ValueError("runs have different T; cannot superpose")
    if t2.resolution != t.resolution:
        raise ValueError("runs have different resolutions")
    if (t2.schedule, t2.beta_start, t2.beta_end) != (
            t.schedule, t.beta_start, t.beta_end):
        raise ValueError(
            f"runs have different beta schedules "
            f"({t.schedule} {t.beta_start}..{t.beta_end} vs "
            f"{t2.schedule} {t2.beta_start}..{t2.beta_end}); "
            "cannot superpose")


def make_stacked_eps_fn(model, params_list, label=None,
                        schedule: Optional[DiffusionSchedule] = None
                        ) -> Callable:
    """One fused ``(x, t) -> (M, B, ...)`` eps call over M checkpoints of
    the SAME architecture (see
    :func:`superdiff_tpu.diffusion.superdiff.stack_eps_fns`). ``label``
    follows :func:`make_eps_fn` semantics (None -> null/unconditional).
    v/x0-headed models are converted to eps exactly as in
    :func:`make_eps_fn_p` (``schedule`` required for those)."""
    from superdiff_tpu.diffusion.superdiff import stack_eps_fns

    kind = getattr(model, "parameterization", "eps")
    if kind != "eps" and schedule is None:
        raise ValueError(
            f"model predicts {kind!r}; pass schedule= to "
            "make_stacked_eps_fn so the prediction can be converted to eps")

    def _apply(p, x, t, *cond):
        pred = model.apply(p, x, t, *cond)
        if kind == "eps":
            return pred
        from superdiff_tpu.diffusion.process import eps_from_pred
        return eps_from_pred(schedule, x, t, pred, kind)

    conditional = getattr(model, "num_classes", 0) > 0
    if not conditional:
        return stack_eps_fns(_apply, params_list)
    fixed = model.null_label if label is None else int(label)

    def apply_fn(p, x, t):
        y = jnp.full((x.shape[0],), fixed, dtype=jnp.int32)
        return _apply(p, x, t, y)

    return stack_eps_fns(apply_fn, params_list)


def same_architecture(cfg: Config, cfg2: Config) -> bool:
    """True when two run configs build identical model graphs (so their
    parameter pytrees can be stacked for the fused superposition call)."""
    import dataclasses

    return dataclasses.asdict(cfg.model) == dataclasses.asdict(cfg2.model)


def make_eps_fn_p(model, label: Optional[int] = None,
                  schedule: Optional[DiffusionSchedule] = None) -> Callable:
    """Sampler-facing eps function with params as the FIRST argument:
    ``fn(params, x, t)`` (or ``fn(params, x, t, y)`` for
    ``label="per_sample"``).

    Use this form inside ``jax.jit`` so the parameter pytree stays a jit
    *argument*: closing over params embeds the full weight arrays in the
    lowered module, and on a remote-compile backend a two-model 256² UNet
    pair (~300 MB of constants) exceeds the compile-request size limit
    (HTTP 413). Label semantics as :func:`make_eps_fn`.

    Models whose head predicts v or x0 (``model.parameterization``,
    arXiv:2202.00512) are converted to the eps the samplers consume with
    one fused multiply-add per call — ``schedule`` is required for those
    (it carries the alpha_bar table the conversion reads).
    """
    kind = getattr(model, "parameterization", "eps")
    if kind != "eps" and schedule is None:
        raise ValueError(
            f"model predicts {kind!r}; pass schedule= to make_eps_fn_p so "
            "the prediction can be converted to eps for the samplers")

    def _apply(p, x, t, *cond):
        pred = model.apply(p, x, t, *cond)
        if kind == "eps":
            return pred
        from superdiff_tpu.diffusion.process import eps_from_pred
        return eps_from_pred(schedule, x, t, pred, kind)

    conditional = getattr(model, "num_classes", 0) > 0
    if not conditional:
        return _apply
    if label == "per_sample":
        return _apply
    fixed = model.null_label if label is None else int(label)

    def fn(p, x, t):
        y = jnp.full((x.shape[0],), fixed, dtype=jnp.int32)
        return _apply(p, x, t, y)

    return fn


def make_eps_fn(model, params,
                label: Optional[int] = None,
                schedule: Optional[DiffusionSchedule] = None) -> Callable:
    """Build the sampler-facing eps function with ``params`` bound.

    For conditional models, ``label=None`` means the null (unconditional)
    label; a fixed int broadcasts over the batch. Returns a function with
    the unconditional signature ``(x, t) -> eps`` when ``label`` is bound,
    or the conditional ``(x, t, y)`` when the model is conditional and the
    caller wants per-sample labels (pass ``label="per_sample"``). Prefer
    :func:`make_eps_fn_p` under jit (see its note on remote-compile size).
    ``schedule`` is required for v/x0-parameterized models (same contract
    as :func:`make_eps_fn_p`).
    """
    import functools

    return functools.partial(make_eps_fn_p(model, label, schedule=schedule),
                             params)
