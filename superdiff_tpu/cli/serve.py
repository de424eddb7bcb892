"""Serve a trained run over HTTP — the online half of ``src/sampling.py``.

The reference's sampling module is an empty stub and its checkpoints are
never loaded by any code path (SURVEY.md §2.3, §5.4); this CLI loads one,
applies the production sampling dtype policy, warms the default executable
and serves micro-batched requests (see ``superdiff_tpu/serve.py`` for the
batching/compile model).

Usage:
    python -m superdiff_tpu.cli.serve --run-dir RUN --port 8000 \
        [--batch-size 16] [--method dpmpp --steps 10] [--data-parallel]

    curl -s localhost:8000/healthz
    curl -s localhost:8000/info
    curl -s -X POST localhost:8000/sample \
        -d '{"num": 4, "label": 1, "method": "dpmpp", "steps": 10}' \
        | python -c "import sys, json, base64; r=json.load(sys.stdin); \
open('out.png','wb').write(base64.b64decode(r['data']))"
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="HTTP sampling service")
    p.add_argument("--run-dir", required=True,
                   help="training run dir or exported inference artifact")
    p.add_argument("--run-dir2", default=None,
                   help="second trained run: enables method=superdiff "
                        "(online superposition with Itô log-densities in "
                        "the response)")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--best", action="store_true",
                   help="serve the best-validation checkpoint")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch-size", type=int, default=16,
                   help="fixed device batch (the micro-batching capacity)")
    p.add_argument("--max-wait-ms", type=float, default=20.0,
                   help="coalescing window before a partial batch launches")
    p.add_argument("--method",
                   choices=["ddpm", "ddim", "dpmpp", "superdiff"],
                   default=None,
                   help="spec warmed at startup (default: the run config's "
                        "sampling.method when it names a fast sampler — "
                        "distilled students stamp ddim + their trained "
                        "step count — else ddim)")
    p.add_argument("--mode", choices=["or", "and"], default="or",
                   help="superdiff mixing mode for the warmed spec")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--data-parallel", action="store_true",
                   help="shard each batch over all devices")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from superdiff_tpu.inference import apply_sampling_policy, load_run
    from superdiff_tpu.serve import (SamplerService, SampleSpec,
                                     make_http_server)

    mesh = None
    if args.data_parallel:
        from superdiff_tpu.parallel import make_mesh, maybe_init_distributed
        maybe_init_distributed()
        mesh = make_mesh()
        if args.batch_size % mesh.devices.size:
            raise SystemExit(f"--batch-size {args.batch_size} not divisible "
                             f"by {mesh.devices.size} devices")

    cfg, model, schedule, ema = load_run(args.run_dir, step=args.step,
                                         best=args.best)
    model, ema = apply_sampling_policy(model, ema)

    model2 = ema2 = None
    if args.run_dir2:
        from superdiff_tpu.inference import check_superpose_compat

        cfg2, model2, schedule2, ema2 = load_run(args.run_dir2)
        try:
            # shared forward SDE: T / resolution / beta schedule
            check_superpose_compat(cfg, cfg2)
        except ValueError as e:
            raise SystemExit(f"--run-dir2 incompatible: {e}")
        # conditioning must agree too: the service sends ONE per-slot label
        # vector to both models (mismatched num_classes would gather-clamp
        # into the wrong class embedding silently)
        if (cfg2.model.conditional != cfg.model.conditional
                or cfg2.model.num_classes != cfg.model.num_classes):
            raise SystemExit(
                "--run-dir2 conditioning differs (conditional/num_classes "
                "must match --run-dir for superposed serving)")
        model2, ema2 = apply_sampling_policy(model2, ema2)
    elif args.method == "superdiff":
        raise SystemExit("--method superdiff requires --run-dir2")

    # --method omitted: warm a distilled student on the exact spec it
    # trained for (cli/distill.py stamps method/num_steps/t_spacing/
    # clip_x0); otherwise keep the ddim-50 default. t_spacing and clip_x0
    # are run-level service policy, not request knobs.
    from superdiff_tpu.inference import resolve_sampler_spec
    method, steps, t_spacing, clip_x0 = resolve_sampler_spec(
        cfg, args.method, args.steps,
        allowed=("ddim", "dpmpp"), fallback="ddim")

    service = SamplerService(
        model, schedule, ema, resolution=cfg.training.resolution,
        conditional=cfg.model.conditional, batch_size=args.batch_size,
        max_wait_ms=args.max_wait_ms, mesh=mesh,
        params2=ema2, model2=model2,
        t_spacing=t_spacing, clip_x0=clip_x0)

    steps = steps or (10 if method == "dpmpp" else 50)
    spec = SampleSpec(method=method, steps=steps, mode=args.mode)
    print(f"warming {spec} at batch {args.batch_size} ...", flush=True)
    sec = service.warmup(spec)
    print(f"warm ({sec:.1f}s). serving on http://{args.host}:{args.port}",
          flush=True)

    httpd = make_http_server(service, args.host, args.port,
                             info={"run_dir": args.run_dir,
                                   "preset": cfg.model.preset})
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        service.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
