"""Online-serving latency/throughput on the real chip.

Starts the HTTP sampling service (superdiff_tpu/serve.py) in-process
against a trained run dir, warms the executable, then measures:

- single-request latency (one /sample of `num` images, end to end:
  HTTP parse -> queue -> device launch -> base64 response), p50/p95
- coalesced throughput: `CONCURRENCY` client threads firing back-to-back
  requests, aggregate samples/sec (exercises the micro-batcher: requests
  with one spec share a fixed-batch executable launch)

One JSON line per (method, steps) point.

    RUN_DIR=data/outputs/TB/experiment_q256_run_q_attn256d_r3c \
        python scripts/bench_r3_serve.py > /tmp/r3_serve.jsonl 2>/tmp/r3_serve.log
"""

import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUN_DIR = os.environ["RUN_DIR"]
PORT = int(os.environ.get("PORT", "8765"))
BATCH = int(os.environ.get("BATCH", "16"))
NUM = int(os.environ.get("NUM", "4"))            # images per request
N_REQ = int(os.environ.get("N_REQ", "12"))       # timed requests per point
CONCURRENCY = int(os.environ.get("CONCURRENCY", "4"))
POINTS = [("dpmpp", 10), ("ddim", 50)]


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def post(path, payload, timeout=600):
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def main():
    from superdiff_tpu.inference import apply_sampling_policy, load_run
    from superdiff_tpu.serve import SamplerService, make_http_server

    cfg, model, schedule, ema = load_run(RUN_DIR)
    model, ema = apply_sampling_policy(model, ema)
    svc = SamplerService(model, schedule, ema,
                         resolution=cfg.training.resolution,
                         conditional=cfg.model.conditional,
                         batch_size=BATCH)
    httpd = make_http_server(svc, "127.0.0.1", PORT)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    log(f"service up on :{PORT} (batch {BATCH})")

    for method, steps in POINTS:
        payload = {"num": NUM, "method": method, "steps": steps}
        tic = time.time()
        post("/sample", payload)                 # compile + warm
        log(f"[{method}-{steps}] warm (compile): {time.time()-tic:.0f}s")

        # single-request latency
        lats = []
        for _ in range(N_REQ):
            tic = time.time()
            out = post("/sample", payload)
            lats.append(time.time() - tic)
            assert len(out["images"]) == NUM
        lats.sort()
        p50 = lats[len(lats) // 2]
        p95 = lats[min(len(lats) - 1, int(len(lats) * 0.95))]

        # coalesced throughput: CONCURRENCY threads, back-to-back
        done = {"n": 0}
        lock = threading.Lock()
        stop_at = time.time() + max(20.0, p50 * 6)

        def client():
            while time.time() < stop_at:
                post("/sample", payload)
                with lock:
                    done["n"] += NUM

        tic = time.time()
        threads = [threading.Thread(target=client)
                   for _ in range(CONCURRENCY)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        agg = done["n"] / (time.time() - tic)

        rec = {"method": method, "steps": steps, "num_per_request": NUM,
               "device_batch": BATCH,
               "latency_p50_s": round(p50, 3), "latency_p95_s": round(p95, 3),
               "coalesced_samples_per_sec": round(agg, 2),
               "concurrency": CONCURRENCY}
        print(json.dumps(rec), flush=True)
        log(str(rec))

    httpd.shutdown()
    svc.close()


if __name__ == "__main__":
    main()
