"""Round-3 tuning A/B on the real chip: scan unroll, flash block sizes,
and the attn256d flagship candidate's sampling throughput.

All points run under the production sampling dtype policy (bf16 norms +
bf16 weight cast). One JSON line per point:

    python scripts/bench_r3_tuning.py > /tmp/r3_tuning.jsonl 2>/tmp/r3_tuning.log
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T = 1000
BATCH = 16
RES = 256


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def set_env(**kv):
    import jax

    for k, v in kv.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = str(v)
    jax.clear_caches()      # custom_vjp traces cache by avals (CLAUDE.md)


_params_cache = {}


def measure(tag, preset, batch=BATCH):
    import jax
    import jax.numpy as jnp
    from superdiff_tpu.diffusion import make_schedule, ddpm_sample
    from superdiff_tpu.inference import cast_sampling_params
    from superdiff_tpu.models.presets import build_model
    from superdiff_tpu.utils.env import host_init

    model = build_model(preset, num_classes=2, norm_dtype=jnp.bfloat16)
    shape = (batch, RES, RES, 1)
    y = jnp.zeros((batch,), dtype=jnp.int32)
    if preset not in _params_cache:
        x = jnp.zeros(shape, dtype=jnp.float32)
        t0 = jnp.zeros((batch,), dtype=jnp.int32)
        _params_cache[preset] = host_init(
            model.init, jax.random.PRNGKey(0), x, t0, y)
    params = cast_sampling_params(_params_cache[preset])

    schedule = make_schedule(T)
    fn = lambda xx, tt, yy: model.apply(params, xx, tt, yy)
    sample = jax.jit(lambda r: ddpm_sample(
        schedule, fn, shape, r, y=y, guidance_scale=1.0))

    tic = time.time()
    sample(jax.random.PRNGKey(1)).block_until_ready()
    log(f"[{tag}] compile+first: {time.time()-tic:.0f}s")
    best = float("inf")
    for i in range(2):
        tic = time.time()
        out = sample(jax.random.PRNGKey(2 + i))
        out.block_until_ready()
        best = min(best, time.time() - tic)
    assert bool(jnp.isfinite(out).all())
    rec = {"tag": tag, "preset": preset, "batch": batch,
           "samples_per_sec": round(batch / best, 4),
           "ms_per_step": round(best / T * 1e3, 3)}
    print(json.dumps(rec), flush=True)
    log(f"[{tag}] {rec}")
    return rec


def main():
    import jax

    log(f"backend: {jax.default_backend()}")

    # 1. scan unroll on the flagship
    set_env(SUPERDIFF_TPU_SCAN_UNROLL=None)
    measure("eff256-unroll1", "eff256")
    set_env(SUPERDIFF_TPU_SCAN_UNROLL=2)
    measure("eff256-unroll2", "eff256")
    set_env(SUPERDIFF_TPU_SCAN_UNROLL=None)

    # 2. flash block tuning at S=1024 (attn256 sampling end-to-end)
    for bq, bk in ((256, 512), (512, 512), (256, 1024), (512, 1024)):
        set_env(SUPERDIFF_TPU_FLASH_BQ=bq, SUPERDIFF_TPU_FLASH_BK=bk)
        measure(f"attn256-bq{bq}-bk{bk}", "attn256")
    set_env(SUPERDIFF_TPU_FLASH_BQ=None, SUPERDIFF_TPU_FLASH_BK=None)

    # 3. attn256d flagship candidate (random params — throughput only;
    #    quality comes from the training A/B)
    measure("attn256d", "attn256d")
    set_env(SUPERDIFF_TPU_SCAN_UNROLL=2)
    measure("attn256d-unroll2", "attn256d")
    set_env(SUPERDIFF_TPU_SCAN_UNROLL=None)


if __name__ == "__main__":
    main()
