"""Scoped-VMEM budget A/B via per-compile compiler_options.

The remote-TPU plugin's local flag parser rejects TPU-only XLA_FLAGS
(``Unknown flag in XLA_FLAGS``), so the scoped-VMEM experiment from
bench_r3_xlaflags.py runs here through ``.lower().compile(
compiler_options=...)``, which ships the option to the device-side
compiler instead. Flagship sampler, DDPM-1000, batch 16, bf16 policy.

    python scripts/bench_r3_vmem.py > /tmp/r3_vmem.jsonl 2>/tmp/r3_vmem.log
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T = 1000
BATCH = 16
RES = 256
PRESET = "attn256d"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
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
    jitted = jax.jit(lambda r: ddpm_sample(
        schedule, fn, shape, r, y=y, guidance_scale=1.0))
    lowered = jitted.lower(jax.random.PRNGKey(1))

    for tag, opts in [
        ("default", None),
        ("vmem32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
        ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ]:
        try:
            tic = time.time()
            compiled = (lowered.compile() if opts is None
                        else lowered.compile(compiler_options=opts))
            log(f"[{tag}] compile: {time.time()-tic:.0f}s")
            out = compiled(jax.random.PRNGKey(1))
            out.block_until_ready()              # load + warm
            best = float("inf")
            for i in range(2):
                tic = time.time()
                out = compiled(jax.random.PRNGKey(2 + i))
                out.block_until_ready()
                best = min(best, time.time() - tic)
            assert bool(jnp.isfinite(out).all())
            print(json.dumps({
                "tag": tag, "samples_per_sec": round(BATCH / best, 4),
                "ms_per_step": round(best / T * 1e3, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"tag": tag, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
