"""Round-3 training-step throughput A/B on the real TPU chip.

Sampling got +15% from bf16 norm passes (BASELINE.md round-3 policy
table); the TRAIN step still runs every GroupNorm chain in f32 — fwd AND
bwd — so the same HBM-traffic argument applies twice. This measures the
donated jitted train step (loss+grads+Adam+EMA+CFG dropout, exactly
``training/steps.make_train_step``) for {eff256, attn256d} x
{f32, bf16 norms} x batch {32, 64}, and quantifies the numerics impact
as cosine similarity / relative L2 between the f32-norm and bf16-norm
gradients on one batch (params and optimizer state stay f32 either way;
GroupNorm statistics still reduce in f32 under the bf16 policy —
``models/layers.py::NormAct``).

    python scripts/bench_r3_train.py > /tmp/r3_train.jsonl 2>/tmp/r3_train.log
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_state(model, batch, res):
    import jax
    import jax.numpy as jnp
    from superdiff_tpu.training.state import (create_train_state,
                                              make_optimizer)

    x = jnp.zeros((batch, res, res, 1), dtype=jnp.float32)
    t0 = jnp.zeros((batch,), dtype=jnp.int32)
    y = jnp.zeros((batch,), dtype=jnp.int32)
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
    batch_data = {
        "image": jax.random.normal(jax.random.PRNGKey(1),
                                   (batch, res, res, 1)),
        "label": jnp.zeros((batch,), dtype=jnp.int32),
    }
    tic = time.time()
    state, m = step(state, batch_data)
    jax.block_until_ready(m["loss"])
    log(f"[{tag}] compile+first: {time.time()-tic:.0f}s")
    # warm the remote plugin's deferred executable-load out of the window
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


def grad_agreement(preset, res=256, batch=8):
    """Cosine similarity + relative L2 of grads: f32 vs bf16 norm passes,
    same params, same batch, same rng."""
    import jax
    import jax.numpy as jnp
    from superdiff_tpu.diffusion import make_schedule
    from superdiff_tpu.diffusion.process import training_step as loss_impl
    from superdiff_tpu.models.presets import build_model
    from superdiff_tpu.utils.env import host_init

    schedule = make_schedule(1000)
    x = jax.random.normal(jax.random.PRNGKey(5), (batch, res, res, 1))
    y = jnp.zeros((batch,), jnp.int32)
    t0 = jnp.zeros((batch,), jnp.int32)

    grads = {}
    for tag, nd in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = build_model(preset, num_classes=2, norm_dtype=nd)
        params = host_init(model.init, jax.random.PRNGKey(0), x, t0, y)

        def loss(p):
            fn = lambda xt, t, yy: model.apply(p, xt, t, yy)
            return loss_impl(schedule, fn, x, jax.random.PRNGKey(7), y=y)

        g = jax.jit(jax.grad(loss))(params)
        grads[tag] = jnp.concatenate([
            l.astype(jnp.float32).ravel()
            for l in jax.tree_util.tree_leaves(g)])
        log(f"[grad-{tag}] done")
    a, b = grads["f32"], grads["bf16"]
    cos = float(jnp.vdot(a, b) /
                (jnp.linalg.norm(a) * jnp.linalg.norm(b)))
    rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(a))
    rec = {"bench": "grad_agreement", "preset": preset,
           "cosine": round(cos, 6), "rel_l2": round(rel, 6)}
    print(json.dumps(rec), flush=True)
    log(f"{rec}")
    return rec


def main():
    import jax
    import jax.numpy as jnp
    from superdiff_tpu.models.presets import build_model

    log(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    # presets via env (round 5 re-bases the ledger on the settled
    # flagship: PRESETS=wide256 adds the missing wide256 rows)
    spec = os.environ.get("PRESETS", "eff256:32:64,attn256d:32")
    plan = []
    for entry in spec.split(","):
        parts = entry.split(":")
        plan.append((parts[0], tuple(int(b) for b in parts[1:]) or (32,)))
    for preset, batches in plan:
        for nd_tag, nd in (("f32n", jnp.float32), ("bf16n", jnp.bfloat16)):
            model = build_model(preset, num_classes=2, norm_dtype=nd)
            for batch in batches:
                jax.clear_caches()
                try:
                    bench_train(f"{preset}-{nd_tag}-b{batch}", model,
                                batch=batch)
                except Exception as e:
                    print(json.dumps({"bench": "train",
                                      "tag": f"{preset}-{nd_tag}-b{batch}",
                                      "error": f"{type(e).__name__}: {e}"}),
                          flush=True)
                    log(f"[{preset}-{nd_tag}-b{batch}] FAILED: {e}")

    grad_agreement(os.environ.get("GRAD_PRESET", "eff256"))


if __name__ == "__main__":
    main()
