"""Round-4 long-sequence flash-attention execution on the real chip
(VERDICT r3 #5: "nothing has ever executed above S=4096").

Runs the Pallas flash kernel (ops/flash_attention.py) in the regime its
docstring claims — full-image-scale attention where the XLA path's
materialized score matrix stops fitting:

  S=16384  (128² feature map)  fwd and fwd+bwd, flash vs XLA attempt.
           XLA's scores at B=1, H=4: 4·16384² f32 = 4.3 GB (x2 fwd+bwd
           residency) — may or may not survive in 16 GB HBM.
  S=65536  (256² full-image)   fwd, flash only, B=1 H=4 D=64.
           XLA would need 4·65536² f32 = 68 GB of scores: cannot exist.
           Flash streams O(S·D): q/k/v/o = 4·65536·4·64·2B = 134 MB.

Per point: ms (best of 2 after warm), achieved FLOP/s (4·S²·D·H·B matmul
FLOPs fwd, 2.5x that fwd+bwd), HBM bytes touched by the flash streams.

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


def qkv(rng, S, dtype):
    import jax
    import jax.numpy as jnp
    ks = jax.random.split(rng, 3)
    shape = (1, S, H, D)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


def run_point(tag, S, mode, path):
    """mode: fwd | fwdbwd; path: flash | xla."""
    import jax
    import jax.numpy as jnp
    from superdiff_tpu.ops.flash_attention import flash_attention

    def xla_attn(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(jnp.float32(D))
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    attn = flash_attention if path == "flash" else xla_attn
    q, k, v = qkv(jax.random.PRNGKey(0), S, jnp.bfloat16)

    if mode == "fwd":
        f = jax.jit(attn)
        work = lambda: f(q, k, v).block_until_ready()
    else:
        loss = lambda q, k, v: attn(q, k, v).astype(jnp.float32).sum()
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        work = lambda: jax.block_until_ready(g(q, k, v))

    try:
        tic = time.time()
        work()
        log(f"[{tag}] compile+first: {time.time()-tic:.0f}s")
        best = float("inf")
        for _ in range(2):
            tic = time.time()
            work()
            best = min(best, time.time() - tic)
    except Exception as e:
        rec = {"point": tag, "S": S, "mode": mode, "path": path,
               "ok": False, "error": str(e)[:200]}
        print(json.dumps(rec), flush=True)
        log(f"[{tag}] FAILED: {str(e)[:200]}")
        return

    mm_flops = 4.0 * S * S * D * H          # QK^T + PV, B=1
    if mode == "fwdbwd":
        mm_flops *= 2.5                     # dQ,dK,dV recomputation pair
    stream_bytes = 4 * S * H * D * 2        # q,k,v,o bf16
    rec = {"point": tag, "S": S, "mode": mode, "path": path, "ok": True,
           "ms": round(best * 1e3, 2),
           "achieved_tflops": round(mm_flops / best / 1e12, 1),
           "flash_stream_mb": round(stream_bytes / 2**20, 1),
           "xla_score_gb": round(H * S * S * 4 / 2**30, 1)}
    print(json.dumps(rec), flush=True)
    log(str(rec))


def main():
    global jax
    import jax
    log(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    run_point("s16k-fwd-flash", 16384, "fwd", "flash")
    run_point("s16k-fwdbwd-flash", 16384, "fwdbwd", "flash")
    run_point("s16k-fwd-xla", 16384, "fwd", "xla")
    run_point("s16k-fwdbwd-xla", 16384, "fwdbwd", "xla")
    run_point("s64k-fwd-flash", 65536, "fwd", "flash")


if __name__ == "__main__":
    main()
