"""Round-4 long-sequence flash-attention execution on the real chip
(VERDICT r3 #5: "nothing has ever executed above S=4096").

Runs the Pallas flash kernel (ops/flash_attention.py) in the regime its
docstring claims — full-image-scale attention where the XLA path's
materialized score matrix stops fitting:

  S=16384  (128² feature map)  fwd and fwd+bwd, flash vs XLA.
           XLA's scores at B=1, H=4: 4·16384² f32 = 4 GiB per
           materialization in 16 GB HBM.
  S=65536  (256² full-image)   fwd, flash only, B=1 H=4 D=64.
           XLA would need 4·65536² f32 = 64 GiB of scores: cannot exist.
           Flash streams O(S·D): q/k/v/o = 128 MiB total.

Measurement protocol (remote-tunnel rule, CLAUDE.md): single-op timings
are meaningless — each point runs R CHAINED applications inside one
``lax.scan`` (iteration i+1 consumes iteration i's output as its query,
so nothing can be elided or memoized) and reports total/R. fwd+bwd chains
a gradient step the same way.

One JSON line per measurement:
    python scripts/bench_r4_longseq.py > /tmp/r4_longseq.jsonl 2>/tmp/r4_longseq.log
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, D = 4, 64


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run_point(tag, S, mode, path, reps):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from superdiff_tpu.ops.flash_attention import flash_attention

    def xla_attn(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(jnp.float32(D))
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    attn = flash_attention if path == "flash" else xla_attn
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    shape = (1, S, H, D)
    q, k, v = (jax.random.normal(kk, shape, jnp.bfloat16) for kk in ks)

    if mode == "fwd":
        # chain: q_{i+1} = attn(q_i, k, v) — serial by construction
        def chained(q0):
            def body(c, _):
                return attn(c, k, v), ()
            return lax.scan(body, q0, None, length=reps)[0]
        f = jax.jit(chained)
        work = lambda: f(q).block_until_ready()
    else:
        def loss(qq):
            return attn(qq, k, v).astype(jnp.float32).sum()

        def chained(q0):
            def body(c, _):
                g = jax.grad(loss)(c)
                return (c + 1e-3 * g.astype(c.dtype)), ()
            return lax.scan(body, q0, None, length=reps)[0]
        f = jax.jit(chained)
        work = lambda: f(q).block_until_ready()

    try:
        tic = time.time()
        work()
        log(f"[{tag}] compile+first: {time.time()-tic:.0f}s")
        best = float("inf")
        for _ in range(2):
            tic = time.time()
            work()
            best = min(best, time.time() - tic)
        ms = best / reps * 1e3
    except Exception as e:
        rec = {"point": tag, "S": S, "mode": mode, "path": path,
               "ok": False, "error": str(e)[:200]}
        print(json.dumps(rec), flush=True)
        log(f"[{tag}] FAILED: {str(e)[:200]}")
        return

    mm_flops = 4.0 * S * S * D * H          # QK^T + PV, B=1
    if mode == "fwdbwd":
        # standard flash-with-recompute accounting (ADVICE r4): fwd 2
        # matmuls + bwd 4 (dQ, dK, dV, dS) + score recompute = 3.5x the
        # forward matmul FLOPs. flash-vs-XLA ratios are factor-invariant.
        mm_flops *= 3.5
    rec = {"point": tag, "S": S, "mode": mode, "path": path, "ok": True,
           "flop_factor": 3.5 if mode == "fwdbwd" else 1.0,
           "reps_chained": reps, "ms_per_apply": round(ms, 2),
           "achieved_tflops": round(mm_flops / (ms / 1e3) / 1e12, 1),
           "flash_stream_mb": round(4 * S * H * D * 2 / 2**20, 1),
           "xla_score_gib": round(H * S * S * 4 / 2**30, 1)}
    print(json.dumps(rec), flush=True)
    log(str(rec))


def main():
    import jax
    log(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    run_point("s16k-fwd-flash", 16384, "fwd", "flash", 20)
    run_point("s16k-fwdbwd-flash", 16384, "fwdbwd", "flash", 8)
    run_point("s16k-fwd-xla", 16384, "fwd", "xla", 8)
    run_point("s16k-fwdbwd-xla", 16384, "fwdbwd", "xla", 4)
    run_point("s64k-fwd-flash", 65536, "fwd", "flash", 8)


if __name__ == "__main__":
    main()
