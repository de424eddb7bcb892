"""Online-serving performance ledger on the real chip (VERDICT r3 #3).

Starts the HTTP sampling service (superdiff_tpu/serve.py) in-process
against a trained run dir and measures, per sampling spec:

- cold-start: service construction -> first sample delivered (dominated by
  the spec's jit compile over the remote tunnel; recorded once per spec),
- single-request latency p50/p95 (one /sample of NUM images, end to end:
  HTTP parse -> queue -> micro-batcher -> device launch -> base64 body),
- coalesced throughput at concurrency 1 / 4 / 16: N client threads firing
  back-to-back requests; aggregate samples/sec. This is the micro-batcher's
  central claim — requests sharing a spec ride one fixed-batch executable
  launch — measured against the chip instead of assumed.

Specs: ddpm-1000 (the reference workload), dpmpp-10 (the production
recommendation), and — when RUN_DIR2 points at a second trained run —
superdiff-or (two-model superposition served online).

One JSON line per (spec, concurrency) point.

    RUN_DIR=data/outputs/TB/experiment_q256_run_q_attn256d_r3c \
    RUN_DIR2=... \
        python scripts/bench_r4_serve.py > /tmp/r4_serve.jsonl 2>/tmp/r4_serve.log
"""

import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUN_DIR = os.environ["RUN_DIR"]
RUN_DIR2 = os.environ.get("RUN_DIR2")
PORT = int(os.environ.get("PORT", "8765"))
BATCH = int(os.environ.get("BATCH", "16"))
NUM = int(os.environ.get("NUM", "4"))            # images per request
N_REQ = int(os.environ.get("N_REQ", "8"))        # timed requests per point
CONCURRENCIES = [int(c) for c in
                 os.environ.get("CONCURRENCIES", "1,4,16").split(",")]
FORMAT = os.environ.get("FORMAT", "png")         # png | npy (VERDICT r4 #5)
SPECS = os.environ.get("SPECS", "dpmpp-10,ddpm-1000,superdiff-1000").split(",")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def post(path, payload, timeout=900):
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def bench_point(method, steps, extra=None):
    payload = {"num": NUM, "method": method, "steps": steps,
               "format": FORMAT}
    payload.update(extra or {})

    tic = time.time()
    post("/sample", payload)                     # compile + warm
    cold = time.time() - tic
    log(f"[{method}-{steps}] cold-start (compile+first): {cold:.1f}s")

    lats = []
    for _ in range(N_REQ):
        tic = time.time()
        out = post("/sample", payload)
        lats.append(time.time() - tic)
        assert out["num"] == NUM and out["data"]
    lats.sort()
    p50 = lats[len(lats) // 2]
    p95 = lats[min(len(lats) - 1, int(len(lats) * 0.95))]

    for conc in CONCURRENCIES:
        done = {"n": 0}
        lock = threading.Lock()
        stop_at = time.time() + max(20.0, p50 * 6)

        def client():
            while time.time() < stop_at:
                post("/sample", payload)
                with lock:
                    done["n"] += NUM

        tic = time.time()
        threads = [threading.Thread(target=client) for _ in range(conc)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        agg = done["n"] / (time.time() - tic)

        rec = {"method": method, "steps": steps, "num_per_request": NUM,
               "format": FORMAT,
               "device_batch": BATCH, "concurrency": conc,
               "cold_start_s": round(cold, 1),
               "latency_p50_s": round(p50, 3),
               "latency_p95_s": round(p95, 3),
               "coalesced_samples_per_sec": round(agg, 2)}
        print(json.dumps(rec), flush=True)
        log(str(rec))


def main():
    from superdiff_tpu.inference import apply_sampling_policy, load_run
    from superdiff_tpu.serve import SamplerService, make_http_server

    tic = time.time()
    cfg, model, schedule, ema = load_run(RUN_DIR)
    model, ema = apply_sampling_policy(model, ema)
    kwargs = {}
    if RUN_DIR2:
        _, model2, _, ema2 = load_run(RUN_DIR2)
        model2, ema2 = apply_sampling_policy(model2, ema2)
        kwargs = dict(model2=model2, params2=ema2)
    svc = SamplerService(model, schedule, ema,
                         resolution=cfg.training.resolution,
                         conditional=cfg.model.conditional,
                         batch_size=BATCH, **kwargs)
    httpd = make_http_server(svc, "127.0.0.1", PORT)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    log(f"service up on :{PORT} (batch {BATCH}) "
        f"in {time.time()-tic:.1f}s after checkpoint load")

    if "dpmpp-10" in SPECS:
        bench_point("dpmpp", 10)
    if "ddpm-1000" in SPECS:
        bench_point("ddpm", 1000)
    if RUN_DIR2 and "superdiff-1000" in SPECS:
        bench_point("superdiff", 1000, {"mode": "or"})

    log(f"service stats: {svc.stats}")
    httpd.shutdown()
    svc.close()


if __name__ == "__main__":
    main()
