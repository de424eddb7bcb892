"""superdiff_tpu — a TPU-native JAX framework for chest X-ray diffusion.

A from-scratch rebuild of the capability surface of the reference
``mo-rsa24/super-diff-disease`` (PyTorch, single-GPU), redesigned TPU-first:

- pure-function diffusion math (``diffusion/``): beta schedules, forward
  process, epsilon-MSE losses (reference: ``src/models/ddpm.py``),
- Flax NHWC UNets (``models/``): a parity model matching the reference's tiny
  CNN (``src/models/unet.py``) and a real class-conditional DDPM UNet,
- compiled samplers (``diffusion/samplers.py``): DDPM ancestral + DDIM as a
  single ``lax.scan`` (reference stub: ``src/sampling.py`` is empty),
- SuperDiff Itô density superposition (``diffusion/superdiff.py``) — the
  capability the reference's README declares but never implements,
- sharded training/sampling over a ``jax.sharding.Mesh`` (``parallel/``),
- Pallas TPU kernels for the hot ops (``ops/``),
- data pipeline with on-device augmentation (``data/``; reference:
  ``src/transforms.py``, ``src/data/dataset.py``),
- training engine with EMA + Orbax checkpointing (``training/``; reference:
  ``src/train/training_logic.py``),
- analysis suite: t-SNE/UMAP projections, Grad-CAM (``analysis/``; reference:
  ``src/visualization/``).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("SUPERDIFF_TPU_PLATFORM"):
    # Explicit platform selection (e.g. SUPERDIFF_TPU_PLATFORM=cpu to run
    # analysis/CLIs on the host while a TPU job trains). Set via jax.config
    # because some environments force a platform the same way, which the
    # JAX_PLATFORMS env var alone cannot override.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms",
                           _os.environ["SUPERDIFF_TPU_PLATFORM"])
        if _os.environ.get("SUPERDIFF_TPU_CPU_DEVICES"):
            _jax.config.update(
                "jax_num_cpu_devices",
                int(_os.environ["SUPERDIFF_TPU_CPU_DEVICES"]))
    except RuntimeError:
        pass  # backend already initialized; leave as-is

if _os.environ.get("SUPERDIFF_TPU_COMPILE_CACHE", "1") not in ("0", "no",
                                                               "false"):
    # Persistent XLA compilation cache, shared by every CLI leg of a
    # pipeline (train -> evaluate -> sample -> compare re-jit the same
    # model at the same shapes in separate processes; remote-TPU compiles
    # take minutes each). Path overridable via the same env var.
    import jax as _jax

    _cache = _os.environ.get("SUPERDIFF_TPU_COMPILE_CACHE")
    if _cache in (None, "1", "yes", "true"):
        # Keyed by the *effective* platform (jax.config may have been set
        # by a caller — e.g. tests/conftest.py — or by sitecustomize, not
        # just our env var): under a remote-TPU plugin even the "cpu"
        # backend may live on the remote host, so sharing one cache between
        # remote-session and local-CPU processes loads AOT results compiled
        # for a different machine (SIGILL risk).
        _plat = (_os.environ.get("SUPERDIFF_TPU_PLATFORM")
                 or getattr(_jax.config, "jax_platforms", None) or "default")
        _cache = _os.path.join(
            _os.path.expanduser("~"), ".cache", f"superdiff_tpu_jax_{_plat}")
    try:
        # Never clobber a cache dir the caller already configured (the test
        # suite points jax at the repo-local .jax_cache/ before importing).
        if not (getattr(_jax.config, "jax_compilation_cache_dir", None)
                or _os.environ.get("JAX_COMPILATION_CACHE_DIR")):
            _jax.config.update("jax_compilation_cache_dir", _cache)
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - very old jax
        pass

from superdiff_tpu.diffusion.schedules import DiffusionSchedule, make_schedule

__all__ = ["DiffusionSchedule", "make_schedule", "__version__"]
