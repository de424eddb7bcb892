"""Round-3 flash-attention backward A/B on the real TPU chip.

Two questions (VERDICT r2 weak #3):

1. Does attn256 TRAINING (fwd+bwd through the 32², S=1024 attention
   levels) get faster with the Pallas backward kernels vs the XLA
   attention vjp fallback?
2. At S=4096 (a 64²-attention variant) — the regime the kernel exists
   for — what do forward sampling and fwd+bwd training cost flash vs
   pure XLA, and does pure XLA even fit?

Measures donated jitted train steps (loss+grads+Adam+EMA, synthetic
batch) and short DDPM sampling scans. One JSON line per point:

    python scripts/bench_r3_flash_bwd.py > /tmp/r3_flash.jsonl 2>/tmp/r3_flash.log
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def set_env(**kv):
    for k, v in kv.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    # the kernel's custom_vjp rules are cached by avals; identical shapes
    # under a different env knob would silently reuse the previous leg's
    # trace (CLAUDE.md Pallas gotcha) — drop all traces on every switch
    import jax

    jax.clear_caches()


def make_state(model, batch, res):
    import jax
    import jax.numpy as jnp
    from superdiff_tpu.training.state import create_train_state, make_optimizer

    x = jnp.zeros((batch, res, res, 1), dtype=jnp.float32)
    t0 = jnp.zeros((batch,), dtype=jnp.int32)
    y = jnp.zeros((batch,), dtype=jnp.int32)
    # create_train_state already host-inits (CPU compile, one transfer)
    return create_train_state(model, jax.random.PRNGKey(0), (x, t0, y),
                              tx=make_optimizer())


def bench_train(tag, model, batch=32, res=256, iters=8):
    import jax
    import jax.numpy as jnp
    from superdiff_tpu.diffusion import make_schedule
    from superdiff_tpu.training.steps import make_train_step

    schedule = make_schedule(1000)
    step = make_train_step(schedule, conditional=True, cfg_drop_prob=0.1,
                           null_label=model.null_label)
    state = make_state(model, batch, res)
    kb = jax.random.PRNGKey(1)
    batch_data = {
        "image": jax.random.normal(kb, (batch, res, res, 1)),
        "label": jnp.zeros((batch,), dtype=jnp.int32),
    }
    tic = time.time()
    state, m = step(state, batch_data)
    jax.block_until_ready(m["loss"])
    log(f"[{tag}] compile+first: {time.time()-tic:.0f}s")
    # the remote PJRT plugin defers a large one-time executable-load cost
    # to the first post-compile execution (~70-80 s measured); warm it out
    # of the timed window
    tic = time.time()
    state, m = step(state, batch_data)
    jax.block_until_ready(m["loss"])
    log(f"[{tag}] warmup step: {time.time()-tic:.1f}s")
    tic = time.time()
    for _ in range(iters):
        state, m = step(state, batch_data)
    jax.block_until_ready(m["loss"])
    dt = (time.time() - tic) / iters
    rec = {"bench": "train", "tag": tag, "batch": batch,
           "ms_per_step": round(dt * 1e3, 2),
           "images_per_sec": round(batch / dt, 1)}
    print(json.dumps(rec), flush=True)
    log(f"[{tag}] {rec}")
    return rec


def bench_sample(tag, model, params, batch=8, res=256, T=200):
    import jax
    import jax.numpy as jnp
    from superdiff_tpu.diffusion import make_schedule, ddpm_sample

    schedule = make_schedule(T)
    shape = (batch, res, res, 1)
    y = jnp.zeros((batch,), dtype=jnp.int32)
    fn = lambda xx, tt, yy: model.apply(params, xx, tt, yy)
    sample = jax.jit(lambda r: ddpm_sample(schedule, fn, shape, r, y=y,
                                           guidance_scale=1.0))
    tic = time.time()
    sample(jax.random.PRNGKey(1)).block_until_ready()
    log(f"[{tag}] compile+first: {time.time()-tic:.0f}s")
    best = float("inf")
    for i in range(2):
        tic = time.time()
        sample(jax.random.PRNGKey(2 + i)).block_until_ready()
        best = min(best, time.time() - tic)
    rec = {"bench": "sample", "tag": tag, "batch": batch, "T": T,
           "ms_per_step": round(best / T * 1e3, 3),
           "samples_per_sec": round(batch / best, 4)}
    print(json.dumps(rec), flush=True)
    log(f"[{tag}] {rec}")
    return rec


def main():
    import jax
    import jax.numpy as jnp
    from superdiff_tpu.models.presets import build_model
    from superdiff_tpu.utils.env import host_init

    log(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    # --- 1. attn256 training: Pallas bwd vs XLA bwd vs no Pallas at all ---
    model = build_model("attn256", num_classes=2)
    for tag, env in (
        ("attn256-train-pallas-bwd", dict(SUPERDIFF_TPU_FLASH_BWD="pallas")),
        ("attn256-train-xla-bwd", dict(SUPERDIFF_TPU_FLASH_BWD="xla")),
        ("attn256-train-no-pallas", dict(SUPERDIFF_TPU_FLASH_BWD=None,
                                         SUPERDIFF_TPU_DISABLE_PALLAS="1")),
    ):
        set_env(**env)
        try:
            bench_train(tag, model)
        except Exception as e:
            print(json.dumps({"bench": "train", "tag": tag,
                              "error": repr(e)[:200]}), flush=True)
            log(f"[{tag}] FAILED: {e!r}")
    set_env(SUPERDIFF_TPU_FLASH_BWD=None, SUPERDIFF_TPU_DISABLE_PALLAS=None)

    # --- 2. S=4096: 64²-attention variant (attn_resolutions=(64,)) ---
    # B=8 keeps the XLA leg's materialized score matrix (8*4 heads *
    # 4096² f32 logits ≈ 2.1 GB) inside HBM so the comparison can run.
    model4k = build_model("eff256", num_classes=2, attn_resolutions=(64,))
    B, RES = 8, 256
    x = jnp.zeros((B, RES, RES, 1), dtype=jnp.float32)
    t0 = jnp.zeros((B,), dtype=jnp.int32)
    y = jnp.zeros((B,), dtype=jnp.int32)
    params = host_init(model4k.init, jax.random.PRNGKey(0), x, t0, y)

    for tag, env in (
        ("attn4k-sample-flash", {}),
        ("attn4k-sample-xla", dict(SUPERDIFF_TPU_DISABLE_PALLAS="1")),
    ):
        merged = dict(SUPERDIFF_TPU_DISABLE_PALLAS=None)
        merged.update(env)
        set_env(**merged)
        try:
            bench_sample(tag, model4k, params, batch=B, res=RES)
        except Exception as e:
            print(json.dumps({"bench": "sample", "tag": tag,
                              "error": repr(e)[:200]}), flush=True)
            log(f"[{tag}] FAILED: {e!r}")

    for tag, env in (
        ("attn4k-train-flash", dict(SUPERDIFF_TPU_FLASH_BWD="pallas")),
        ("attn4k-train-xla", dict(SUPERDIFF_TPU_DISABLE_PALLAS="1",
                                  SUPERDIFF_TPU_FLASH_BWD=None)),
    ):
        merged = dict(SUPERDIFF_TPU_DISABLE_PALLAS=None,
                      SUPERDIFF_TPU_FLASH_BWD=None)
        merged.update(env)
        set_env(**merged)
        try:
            bench_train(tag, model4k, batch=B, res=RES)
        except Exception as e:
            print(json.dumps({"bench": "train", "tag": tag,
                              "error": repr(e)[:200]}), flush=True)
            log(f"[{tag}] FAILED: {e!r}")
    set_env(SUPERDIFF_TPU_DISABLE_PALLAS=None, SUPERDIFF_TPU_FLASH_BWD=None)


if __name__ == "__main__":
    main()
