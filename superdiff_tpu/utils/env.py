"""Environment detection, seeding, and run-path resolution.

Capability of ``src/utils/env.py``:
- cluster detection by hostname sniff or env flag (``env.py:8-10``),
- global seeding (``env.py:12-16``; here: numpy + python random + the JAX
  root key — JAX PRNG is explicit, so ``root_key`` is returned, not hidden
  global state),
- experiment/run/task-keyed path resolution under a cluster-vs-local base
  (``env.py:18-37``).
"""

from __future__ import annotations

import os
import random
import socket
from dataclasses import dataclass

import jax
import numpy as np

from superdiff_tpu.config import Config


def is_cluster() -> bool:
    """True on the HPC/TPU-pod side: env override or hostname sniff."""
    if os.environ.get("IS_CLUSTER") == "1":
        return True
    host = socket.gethostname().lower()
    return any(tag in host for tag in ("login", "node", "tpu", "worker"))


def set_global_seeds(seed: int) -> jax.Array:
    """Seed python/numpy and return the JAX root key.

    JAX randomness is functional — there is no global torch-style seed to
    set; instead every consumer folds from this root key.
    """
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


@dataclass
class RunPaths:
    base: str
    dataset_dir: str
    output_dir: str
    checkpoint_dir: str
    tensorboard_dir: str
    wandb_dir: str
    log_dir: str

    def make_all(self) -> "RunPaths":
        for p in (self.output_dir, self.checkpoint_dir,
                  self.tensorboard_dir, self.wandb_dir, self.log_dir):
            os.makedirs(p, exist_ok=True)
        return self


def resolve_paths(cfg: Config) -> RunPaths:
    """Derive per-run directories keyed by experiment/run/task.

    Mirrors the reference's layout semantics (``src/utils/env.py:18-37``):
    ``<base>/<output_dir>/<task>/experiment_<E>_run_<R>/...`` with the base
    picked by cluster detection.
    """
    base = cfg.paths.cluster_base if is_cluster() else cfg.paths.local_base
    run_key = f"experiment_{cfg.experiment_id}_run_{cfg.run_id}"
    out = os.path.join(base, cfg.paths.output_dir, cfg.task, run_key)
    return RunPaths(
        base=base,
        dataset_dir=os.path.join(base, cfg.paths.dataset_subdir),
        output_dir=out,
        checkpoint_dir=os.path.join(out, cfg.paths.checkpoint_dir),
        tensorboard_dir=os.path.join(out, cfg.paths.tensorboard_dir),
        wandb_dir=os.path.join(out, cfg.paths.wandb_dir),
        log_dir=out,
    )


def host_init(init_fn, *args, cache_key: str | None = None):
    """Run a (potentially expensive-to-compile) init function on the host
    CPU backend and transfer the result to the default device.

    ``model.init`` of the flagship UNet takes minutes to compile on remote
    TPU backends (every init is a fresh XLA program) but seconds on host
    CPU; parameters are backend-agnostic, so initialize where compiles are
    cheap and ship the pytree once (measured 263 s -> 51 s for eff256 on
    the v5e tunnel). No-op placement-wise when the default backend already
    is the CPU.

    ``cache_key`` additionally caches the realized pytree on disk
    (``.jax_cache/params/<key>.pkl``) so repeat bench/dev invocations skip
    the host-CPU compile entirely (533 s per ``bench.py`` run at the
    flagship size on this image's single core). The effective key folds in
    a content digest of ``args`` (PRNG key values, array inputs), so the
    same ``cache_key`` with a different seed misses rather than serving
    another seed's values; a hit is then validated structurally against
    ``jax.eval_shape`` of the same init (an abstract trace — seconds, no
    compile), catching treedef/shape/dtype drift. What this can NOT catch
    is a changed initializer *scheme* behind an identical key, args and
    structure (e.g. switching he_normal -> lecun_normal inside the model):
    bump ``cache_key`` when changing init distributions, or delete
    ``.jax_cache/params/``. Placement: a hit is committed to
    ``jax.devices()[0]``; a miss returns the fresh pytree committed to the
    same device (or uncommitted CPU arrays when CPU *is* the default).
    """
    if cache_key is not None:
        cache_key = f"{cache_key}-{_args_digest(args)}"
        hit = _cached_init(init_fn, args, cache_key)
        if hit is not None:
            return hit
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return init_fn(*args)
    default = jax.devices()[0]
    # The init trace runs on the CPU backend, but op-level dispatches that
    # consult the *global* default backend (ops/attention.py) would still
    # pick Pallas TPU kernels — which cannot lower for CPU. Params are
    # backend-agnostic, so trace init with Pallas off.
    prev = os.environ.get("SUPERDIFF_TPU_DISABLE_PALLAS")
    os.environ["SUPERDIFF_TPU_DISABLE_PALLAS"] = "1"
    try:
        with jax.default_device(cpu):
            out = init_fn(*args)
    finally:
        if prev is None:
            os.environ.pop("SUPERDIFF_TPU_DISABLE_PALLAS", None)
        else:
            os.environ["SUPERDIFF_TPU_DISABLE_PALLAS"] = prev
    if cache_key is not None:
        _cache_write(out, cache_key)
    if default == cpu:
        return out
    return jax.device_put(out, default)


def _args_digest(args) -> str:
    """Short content hash of init args (ADVICE r4): array leaves hash by
    value bytes (a PRNG key IS its values), everything else by repr."""
    import hashlib

    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(args):
        if hasattr(leaf, "dtype"):
            arr = np.asarray(jax.device_get(leaf))
            h.update(str(arr.dtype).encode())
            h.update(str(arr.shape).encode())
            h.update(arr.tobytes())
        else:
            h.update(repr(leaf).encode())
    return h.hexdigest()[:12]


def _params_cache_path(cache_key: str) -> str:
    root = os.environ.get("SUPERDIFF_TPU_CACHE_DIR", ".jax_cache")
    safe = "".join(c if c.isalnum() or c in "-_." else "_"
                   for c in cache_key)
    return os.path.join(root, "params", f"{safe}.pkl")


def _cache_write(pytree, cache_key: str) -> None:
    import pickle
    import tempfile

    path = _params_cache_path(cache_key)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    host = jax.tree_util.tree_map(np.asarray, pytree)
    # atomic rename so a concurrent reader never sees a torn file
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(host, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _cached_init(init_fn, args, cache_key: str):
    """Load a cached init pytree if present AND structurally identical to
    what ``init_fn(*args)`` would produce (treedef + shapes + dtypes from
    ``jax.eval_shape``); None otherwise."""
    import pickle

    path = _params_cache_path(cache_key)
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            host = pickle.load(f)
        want = jax.eval_shape(init_fn, *args)
        got_td = jax.tree_util.tree_structure(host)
        want_td = jax.tree_util.tree_structure(want)
        if got_td != want_td:
            raise ValueError("treedef drift")
        for g, w in zip(jax.tree_util.tree_leaves(host),
                        jax.tree_util.tree_leaves(want)):
            if tuple(g.shape) != tuple(w.shape) or g.dtype != w.dtype:
                raise ValueError(
                    f"leaf drift {g.shape}/{g.dtype} vs {w.shape}/{w.dtype}")
    except Exception as e:  # stale/torn cache -> fresh init rewrites it
        print(f"[host_init] params cache {path!r} invalid ({e}); "
              "re-initializing", flush=True)
        return None
    return jax.device_put(host, jax.devices()[0])
