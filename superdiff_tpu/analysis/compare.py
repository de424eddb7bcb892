"""Cross-model comparison: TB vs PNEUMONIA vs superposed samples.

The reference reserved ``src/visualization/compare.py`` for this and left it
empty (SURVEY.md §2.3). Generates matched batches from two trained runs and
their SuperDiff superposition, renders a comparison panel, and reports the
Itô log-densities of the superposed samples under both models.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from superdiff_tpu.diffusion import ddpm_sample
from superdiff_tpu.diffusion.superdiff import superdiff_sample
from superdiff_tpu.inference import load_run, make_eps_fn_p


def compare_runs(run_dir_a: str, run_dir_b: str, out_dir: str,
                 num_samples: int = 4, seed: int = 0,
                 mode: str = "or",
                 labels=("model A", "model B", "superposed")) -> Dict:
    """Sample A, B, and A+B superposed; write a 3-row panel + stats."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from superdiff_tpu.inference import check_superpose_compat

    cfg_a, model_a, schedule, ema_a = load_run(run_dir_a)
    cfg_b, model_b, schedule_b, ema_b = load_run(run_dir_b)
    check_superpose_compat(cfg_a, cfg_b)   # same T/resolution/beta schedule
    R = cfg_a.training.resolution

    shape = (num_samples, R, R, 1)
    rng = jax.random.PRNGKey(seed)
    # params as jit arguments, never closure constants (make_eps_fn_p):
    # two 256² UNets embedded in one remote-compile request exceed its
    # size limit (HTTP 413)
    apply_a = make_eps_fn_p(model_a, schedule=schedule)
    apply_b = make_eps_fn_p(model_b, schedule=schedule)

    def _single(r, p, applyp):
        return ddpm_sample(schedule, lambda x, t: applyp(p, x, t),
                           shape, r)

    def _superposed(r, pa, pb):
        fns = [lambda x, t: apply_a(pa, x, t),
               lambda x, t: apply_b(pb, x, t)]
        return superdiff_sample(schedule, fns, shape, r, mode=mode)

    xa = jax.jit(_single, static_argnums=2)(rng, ema_a, apply_a)
    xb = jax.jit(_single, static_argnums=2)(rng, ema_b, apply_b)
    xs, logq = jax.jit(_superposed)(rng, ema_a, ema_b)

    rows = [np.asarray(xa), np.asarray(xb), np.asarray(xs)]
    fig, axes = plt.subplots(3, num_samples,
                             figsize=(2.1 * num_samples, 6.5),
                             squeeze=False)
    for r, (row, lab) in enumerate(zip(rows, labels)):
        for c in range(num_samples):
            img = row[c, :, :, 0]
            lo, hi = img.min(), img.max()
            axes[r][c].imshow((img - lo) / max(hi - lo, 1e-6), cmap="gray")
            axes[r][c].axis("off")
        axes[r][0].set_title(lab, fontsize=9, loc="left")
    os.makedirs(out_dir, exist_ok=True)
    panel = os.path.join(out_dir, "comparison.png")
    fig.tight_layout()
    fig.savefig(panel, dpi=100)
    plt.close(fig)

    logq = np.asarray(logq)
    return {
        "panel": panel,
        "logq_model_a": logq[0].tolist(),
        "logq_model_b": logq[1].tolist(),
        "mean_logq_gap": float(np.mean(logq[0] - logq[1])),
    }
