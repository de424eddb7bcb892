"""End-to-end A/B of SUPERDIFF_TPU_LANE_PACK on the flagship presets.

HISTORICAL: this measured the model-path dispatch that existed up to the
round-3 lane-pack decision. Result (one v5e chip, recorded in BASELINE.md):
packed LOSES end-to-end — attn256d 9.46 -> 11.40 ms/step, eff256
8.62 -> 10.56 — so the dispatch was removed from ResBlock/CondUNet and the
op kept standalone (ops/packed_norm.py). Re-running this script on current
code times the identical unpacked model twice, since the env flag no
longer reaches the model path.

    python scripts/bench_r3_lanepack_e2e.py > /tmp/r3_lp_e2e.jsonl 2>/tmp/r3_lp_e2e.log
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 200
BATCH = 16
RES = 256


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from superdiff_tpu.models.presets import build_model
    from superdiff_tpu.utils.env import host_init
    from superdiff_tpu.inference import apply_sampling_policy

    log(f"backend: {jax.default_backend()}")
    for preset in ("attn256d", "eff256"):
        model = build_model(preset, num_classes=2, norm_dtype=jnp.bfloat16)
        shape = (BATCH, RES, RES, 1)
        xz = jnp.zeros(shape, dtype=jnp.float32)
        t0 = jnp.zeros((BATCH,), dtype=jnp.int32)
        y = jnp.zeros((BATCH,), dtype=jnp.int32)
        params = host_init(model.init, jax.random.PRNGKey(0), xz, t0, y)
        model, params = apply_sampling_policy(model, params)
        x0 = jax.random.normal(jax.random.PRNGKey(1), shape)

        for pack in ("0", "1"):
            os.environ["SUPERDIFF_TPU_LANE_PACK"] = pack

            def denoiser_only(x0):
                def step(x, t_scalar):
                    t = jnp.full((BATCH,), t_scalar, dtype=jnp.int32)
                    return model.apply(params, x, t, y).astype(x.dtype), None
                xf, _ = jax.lax.scan(step, x0,
                                     jnp.arange(STEPS, dtype=jnp.int32),
                                     unroll=2)
                return xf

            run = jax.jit(denoiser_only)
            tic = time.time()
            out = jax.block_until_ready(run(x0))
            log(f"  [{preset} pack={pack}] compile+first: "
                f"{time.time() - tic:.0f}s")
            best = float("inf")
            for _ in range(3):
                tic = time.time()
                jax.block_until_ready(run(x0))
                best = min(best, time.time() - tic)
            ms = best / STEPS * 1e3
            rec = {"preset": preset, "lane_pack": pack == "1",
                   "ms_per_step": round(ms, 3),
                   "samples_per_sec_ddpm1000": round(BATCH / (ms * 1.0), 4),
                   "checksum": float(jnp.mean(jnp.abs(out)))}
            print(json.dumps(rec), flush=True)
            log(f"[{preset} pack={pack}] {ms:.2f} ms/step")


if __name__ == "__main__":
    main()
