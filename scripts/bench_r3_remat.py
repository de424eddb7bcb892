"""Round-3 remat A/B on the real TPU chip: what activation
rematerialization buys in trainable batch size and what it costs in step
time.

``model.remat=true`` wraps every ResBlock/attention in ``jax.checkpoint``
(models/unet.py) so the backward pass recomputes block activations
instead of holding them — activation HBM drops from O(sum of all block
activations) to O(one block) per level, for one extra forward. This
measures the donated jitted train step (training/steps.make_train_step,
identical math — parity pinned in tests/test_models.py) on the flagship
``attn256d`` at 256²:

  * batch-doubling ladder {64, 128, 256, 512} with remat off, until the
    chip OOMs -> the no-remat batch ceiling;
  * the same ladder with remat on -> the remat ceiling + recompute tax;
  * grad_accum=4 at the largest common batch — the OTHER memory lever
    (microbatching) — so BASELINE.md can rank remat vs accumulation.

    nohup python scripts/bench_r3_remat.py \
        > /tmp/r3_remat.jsonl 2>/tmp/r3_remat.log &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RES = 256
PRESET = "attn256d"
BATCHES = (64, 128, 256, 512)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_one(tag, model, batch, grad_accum=1, iters=6):
    import jax
    import jax.numpy as jnp
    from superdiff_tpu.diffusion import make_schedule
    from superdiff_tpu.training.state import (create_train_state,
                                              make_optimizer)
    from superdiff_tpu.training.steps import make_train_step

    schedule = make_schedule(1000)
    step = make_train_step(schedule, conditional=True, cfg_drop_prob=0.1,
                           null_label=model.null_label,
                           grad_accum=grad_accum)
    x = jnp.zeros((batch, RES, RES, 1), dtype=jnp.float32)
    t0 = jnp.zeros((batch,), dtype=jnp.int32)
    y = jnp.zeros((batch,), dtype=jnp.int32)
    state = create_train_state(model, jax.random.PRNGKey(0), (x, t0, y),
                               tx=make_optimizer())
    batch_data = {
        "image": jax.random.normal(jax.random.PRNGKey(1),
                                   (batch, RES, RES, 1)),
        "label": jnp.zeros((batch,), dtype=jnp.int32),
    }
    tic = time.time()
    state, m = step(state, batch_data)
    jax.block_until_ready(m["loss"])
    log(f"[{tag}] compile+first: {time.time()-tic:.0f}s")
    tic = time.time()
    state, m = step(state, batch_data)           # deferred-load warmup
    jax.block_until_ready(m["loss"])
    log(f"[{tag}] warmup: {time.time()-tic:.1f}s")
    tic = time.time()
    for _ in range(iters):
        state, m = step(state, batch_data)
    jax.block_until_ready(m["loss"])
    dt = (time.time() - tic) / iters
    rec = {"bench": "remat", "tag": tag, "batch": batch,
           "grad_accum": grad_accum,
           "ms_per_step": round(dt * 1e3, 2),
           "images_per_sec": round(batch / dt, 1)}
    print(json.dumps(rec), flush=True)
    log(f"[{tag}] {rec}")
    return rec


def main():
    import jax
    from superdiff_tpu.models.presets import build_model

    log(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    ceilings = {}
    for remat in (False, True):
        rtag = "remat" if remat else "noremat"
        model = build_model(PRESET, num_classes=2, remat=remat)
        for batch in BATCHES:
            jax.clear_caches()
            tag = f"{PRESET}-{rtag}-b{batch}"
            try:
                bench_one(tag, model, batch)
                ceilings[rtag] = batch
            except Exception as e:
                msg = f"{type(e).__name__}: {str(e)[:200]}"
                print(json.dumps({"bench": "remat", "tag": tag,
                                  "batch": batch, "error": msg}),
                      flush=True)
                log(f"[{tag}] FAILED: {msg}")
                break  # larger batches will OOM too

    # grad_accum at the largest batch BOTH modes survived, remat off —
    # the microbatching alternative for the same activation footprint
    common = min(ceilings.get("noremat", 0), ceilings.get("remat", 0))
    if common >= BATCHES[0]:
        model = build_model(PRESET, num_classes=2, remat=False)
        jax.clear_caches()
        try:
            bench_one(f"{PRESET}-noremat-b{common}-ga4", model, common,
                      grad_accum=4)
        except Exception as e:
            log(f"[ga4] FAILED: {e}")
    # and grad_accum pushing past the no-remat ceiling, if there was one
    no_ceiling = ceilings.get("noremat", 0)
    if no_ceiling and no_ceiling < BATCHES[-1]:
        target = no_ceiling * 2
        k = 2
        model = build_model(PRESET, num_classes=2, remat=False)
        jax.clear_caches()
        try:
            bench_one(f"{PRESET}-noremat-b{target}-ga{k}", model, target,
                      grad_accum=k)
        except Exception as e:
            log(f"[ga-past-ceiling] FAILED: {e}")


if __name__ == "__main__":
    main()
