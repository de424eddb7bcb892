"""Round-3 XLA-flag / scan-unroll sweep on the flagship sampler.

The profile (BASELINE.md round-3 xplane section) says the attn256d step is
52% HBM-bound norm traffic and the conv path is at roofline — kernels are
exhausted, so this sweep probes the *compiler* knobs that change fusion
shape without touching the model: scoped-VMEM budget (bigger fusions keep
more of the norm chain on-chip) and deeper scan unrolling (cross-step
fusion opportunities). XLA_FLAGS are read once at backend init, so every
config runs in a fresh subprocess.

    python scripts/bench_r3_xlaflags.py > /tmp/r3_xlaflags.jsonl 2>/tmp/r3_xlaflags.log

One JSON line per config on stdout.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

T = 1000
BATCH = 16
RES = 256
PRESET = "attn256d"


def worker():
    """Measure one config (current env) and print a JSON line."""
    sys.path.insert(0, REPO)
    import jax
    import jax.numpy as jnp
    from superdiff_tpu.diffusion import make_schedule, ddpm_sample
    from superdiff_tpu.inference import cast_sampling_params
    from superdiff_tpu.models.presets import build_model
    from superdiff_tpu.utils.env import host_init

    model = build_model(PRESET, num_classes=2, norm_dtype=jnp.bfloat16)
    shape = (BATCH, RES, RES, 1)
    x = jnp.zeros(shape, dtype=jnp.float32)
    t0 = jnp.zeros((BATCH,), dtype=jnp.int32)
    y = jnp.zeros((BATCH,), dtype=jnp.int32)
    params = cast_sampling_params(
        host_init(model.init, jax.random.PRNGKey(0), x, t0, y))

    schedule = make_schedule(T)
    fn = lambda xx, tt, yy: model.apply(params, xx, tt, yy)
    sample = jax.jit(lambda r: ddpm_sample(
        schedule, fn, shape, r, y=y, guidance_scale=1.0))

    tic = time.time()
    sample(jax.random.PRNGKey(1)).block_until_ready()
    print(f"compile+first: {time.time()-tic:.0f}s", file=sys.stderr,
          flush=True)
    best = float("inf")
    for i in range(2):
        tic = time.time()
        out = sample(jax.random.PRNGKey(2 + i))
        out.block_until_ready()
        best = min(best, time.time() - tic)
    assert bool(jnp.isfinite(out).all())
    print(json.dumps({
        "tag": os.environ.get("SWEEP_TAG", "?"),
        "xla_flags": os.environ.get("XLA_FLAGS", ""),
        "unroll": os.environ.get("SUPERDIFF_TPU_SCAN_UNROLL", "2(default)"),
        "samples_per_sec": round(BATCH / best, 4),
        "ms_per_step": round(best / T * 1e3, 3),
    }), flush=True)


CONFIGS = [
    ("baseline", {}, None),
    ("vmem32m", {"XLA_FLAGS": "--xla_tpu_scoped_vmem_limit_kib=32768"}, None),
    ("vmem64m", {"XLA_FLAGS": "--xla_tpu_scoped_vmem_limit_kib=65536"}, None),
    ("unroll4", {}, "4"),
    ("unroll8", {}, "8"),
    ("unroll4+vmem64m",
     {"XLA_FLAGS": "--xla_tpu_scoped_vmem_limit_kib=65536"}, "4"),
]


def main():
    for tag, env_extra, unroll in CONFIGS:
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("SUPERDIFF_TPU_SCAN_UNROLL", None)
        env.update(env_extra)
        if unroll is not None:
            env["SUPERDIFF_TPU_SCAN_UNROLL"] = unroll
        env["SWEEP_TAG"] = tag
        print(f"=== {tag} ===", file=sys.stderr, flush=True)
        r = subprocess.run([sys.executable, __file__, "--worker"], env=env)
        if r.returncode != 0:
            print(json.dumps({"tag": tag, "error": r.returncode}),
                  flush=True)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        main()
