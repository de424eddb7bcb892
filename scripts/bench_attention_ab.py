"""A/B: Pallas flash attention vs XLA attention, end-to-end on the real TPU.

Measures full DDPM-1000 sampling throughput of the flagship eff256 preset
(attention at 16², S=256) and of an eff256+32²-attention variant (S=1024),
each with the flash kernel forced on vs off — the measurement behind the
``_flash_min_s`` default in ``ops/attention.py``. Writes one JSON line per
config to stdout.

Run on the default (TPU) backend, in the background:
    python scripts/bench_attention_ab.py > /tmp/attn_ab.json 2>/tmp/attn_ab.log
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))


def measure(tag: str, attn_resolutions, flash_min_s: int,
            batch: int = 16, res: int = 256, T: int = 1000) -> dict:
    os.environ["SUPERDIFF_TPU_FLASH_MIN_S"] = str(flash_min_s)

    import jax
    import jax.numpy as jnp

    from superdiff_tpu.diffusion import make_schedule, ddpm_sample
    from superdiff_tpu.models.presets import build_model
    from superdiff_tpu.utils.env import host_init

    model = build_model("eff256", num_classes=2,
                        attn_resolutions=tuple(attn_resolutions))
    shape = (batch, res, res, 1)
    x = jnp.zeros(shape, dtype=jnp.float32)
    t0 = jnp.zeros((batch,), dtype=jnp.int32)
    y = jnp.zeros((batch,), dtype=jnp.int32)
    params = host_init(model.init, jax.random.PRNGKey(0), x, t0, y)

    schedule = make_schedule(T)
    fn = lambda xx, tt, yy: model.apply(params, xx, tt, yy)
    sample = jax.jit(lambda r: ddpm_sample(schedule, fn, shape, r, y=y))

    tic = time.time()
    sample(jax.random.PRNGKey(1)).block_until_ready()
    compile_s = time.time() - tic

    tic = time.time()
    out = sample(jax.random.PRNGKey(2))
    out.block_until_ready()
    dt = time.time() - tic
    assert bool(jnp.isfinite(out).all()), f"{tag}: non-finite"
    rec = {"tag": tag, "attn_resolutions": list(attn_resolutions),
           "flash_min_s": flash_min_s,
           "samples_per_sec": round(batch / dt, 4),
           "ms_per_step": round(dt / T * 1e3, 3),
           "compile_s": round(compile_s, 1)}
    print(json.dumps(rec), flush=True)
    print(f"{tag}: {rec}", file=sys.stderr, flush=True)
    return rec


CONFIGS = {
    # flagship shape: attention at 16² only (S=256)
    "eff256_s256_xla": ((16,), 1 << 30),
    "eff256_s256_flash": ((16,), 256),
    # 32² attention variant (S=1024 at 128ch + S=256 at 16²)
    "eff256a32_xla": ((32, 16), 1 << 30),
    "eff256a32_flash": ((32, 16), 256),
    # mixed: flash only where it wins (S=1024), XLA at S=256
    "eff256a32_mixed": ((32, 16), 1024),
}


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--only", nargs="*", default=None,
                   help="subset of config tags to run")
    args = p.parse_args()
    for tag, (attn_res, min_s) in CONFIGS.items():
        if args.only and tag not in args.only:
            continue
        measure(tag, attn_res, flash_min_s=min_s)


if __name__ == "__main__":
    main()
