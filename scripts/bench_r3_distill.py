"""Few-step sampling throughput of a progressively-distilled student.

Loads a distilled run dir (``.../distill/sN``) through ``load_run`` — the
real v-parameterized student weights under the round-3 sampling policy —
and times trailing-grid DDIM at the step counts distillation targets.
Completes the fast-sampling ladder (BASELINE.md): DDPM-1000 → DDIM-50 →
DPM++-10 → distilled 4/2/1-step.

    RUN_DIR=data/outputs/TB/experiment_q256_run_q_attn256d_r3b/distill/s1 \
        python scripts/bench_r3_distill.py > /tmp/r3_distill_bench.jsonl
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BATCH", "16"))
STEPS = [int(s) for s in os.environ.get("STEPS", "8,4,2,1").split(",")]


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    from superdiff_tpu.diffusion import ddim_sample
    from superdiff_tpu.inference import (load_run, apply_sampling_policy,
                                         make_eps_fn_p)

    run_dir = os.environ["RUN_DIR"]
    # keep the run's own schedule (kind + beta range): the v->eps
    # conversion and the DDIM grid must use the table it trained under
    cfg, model, schedule, params = load_run(run_dir)
    model, params = apply_sampling_policy(model, params)
    log(f"backend: {jax.default_backend()} run: {run_dir} "
        f"param={getattr(model, 'parameterization', 'eps')}")

    res = cfg.training.resolution
    shape = (BATCH, res, res, 1)
    fn_p = make_eps_fn_p(model, schedule=schedule)
    # honor the student's stamped clip policy (trained on unclipped
    # one-step inversions -> clip_x0=false in the exported config)
    clip = bool(getattr(cfg.sampling, "clip_x0", True))

    for steps in STEPS:
        jitted = jax.jit(lambda p, r, n=steps: ddim_sample(
            schedule, lambda x, t: fn_p(p, x, t), shape, r, num_steps=n,
            eta=0.0, t_spacing="trailing", clip_x0=clip))
        rng = jax.random.PRNGKey(1)
        tic = time.time()
        jax.block_until_ready(jitted(params, rng))
        log(f"  [ddim-{steps} trailing] compile+first: {time.time()-tic:.0f}s")
        best = float("inf")
        for _ in range(3):
            tic = time.time()
            jax.block_until_ready(jitted(params, rng))
            best = min(best, time.time() - tic)
        rec = {"sampler": "ddim-trailing", "steps": steps,
               "samples_per_sec": round(BATCH / best, 3),
               "ms_per_call": round(best / steps * 1e3, 3),
               "sec_per_batch16": round(best, 4)}
        print(json.dumps(rec), flush=True)
        log(f"[ddim-{steps}] {rec}")


if __name__ == "__main__":
    main()
