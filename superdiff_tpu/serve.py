"""Inference serving: micro-batched sampling service + stdlib HTTP app.

Capability extension in the reference's declared direction: its
``src/sampling.py`` is an empty stub (SURVEY.md §2.3) and nothing in the
tree can serve a trained model. This module is the production-serving half
of that surface — ``cli/sample.py`` covers batch/offline generation, this
covers online requests.

TPU-native design:

- **Fixed-shape executables.** XLA compiles one executable per
  ``(method, steps, eta, guidance)`` spec at the service's fixed batch
  size. Requests never trigger recompiles: every device launch runs the
  same padded ``(B, R, R, 1)`` scan regardless of how many samples were
  actually requested (padding slots are discarded). Compile once, launch
  forever — the serving analogue of the static-shape rule.
- **Micro-batching across requests.** A single worker thread owns the
  device (one dispatch stream, no contention) and coalesces queued
  requests with the same spec into one batch; per-sample class labels ride
  a ``y`` vector, so requests for *different* classes share an executable
  and a launch (``make_eps_fn_p(model, "per_sample")``).
- **One host→device transfer.** Params are loaded, policy-cast (bf16) and
  device-put once at startup; request handling moves only the RNG key in
  and the sampled batch out.

No framework dependencies: the HTTP layer is ``http.server`` from the
stdlib (ThreadingHTTPServer), JSON in / JSON+base64 out.

With a second model loaded (``--run-dir2``) the service also serves the
framework's namesake capability online: ``method="superdiff"`` runs the
two-model superposition (sequential per-model closures — the production
arrangement ``cli/sample.py`` ships) and returns the per-sample Itô
log-density matrix in the response's ``logq`` field, so clients see
which model "owns" each superposed sample.

Usage (see ``cli/serve.py`` for flags)::

    python -m superdiff_tpu.cli.serve --run-dir RUN --port 8000
    curl -s localhost:8000/healthz
    curl -s -X POST localhost:8000/sample \
        -d '{"num": 4, "label": 1, "method": "dpmpp", "steps": 10}'
    # superposition (requires --run-dir2):
    curl -s -X POST localhost:8000/sample \
        -d '{"num": 4, "method": "superdiff", "mode": "or"}'
"""

from __future__ import annotations

import base64
import io
import json
import logging
import os
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

_METHODS = ("ddpm", "ddim", "dpmpp", "superdiff")
_SD_MODES = ("or", "and")

_log = logging.getLogger("superdiff_tpu.serve")


@dataclass(frozen=True)
class SampleSpec:
    """Everything that selects a compiled executable (batch-shape static)."""
    method: str = "ddim"
    steps: int = 50
    eta: float = 0.0
    guidance: float = 1.0
    mode: str = "or"              # superdiff mixing mode (ignored otherwise)

    def canonical(self, T: int) -> "SampleSpec":
        """Validate and normalize to the executable-cache key. Fields a
        method ignores are folded to one canonical value so equivalent
        requests never compile twice: ``ddpm`` always runs the full
        schedule (steps -> T) and is ancestral (eta rejected, like dpmpp);
        only ddim consumes eta; only superdiff consumes mode."""
        if self.method not in _METHODS:
            raise ValueError(f"method must be one of {_METHODS}")
        if self.method != "ddim" and self.eta:
            raise ValueError("eta only applies to ddim (ddpm is ancestral "
                             "at full T; dpmpp is an ODE)")
        if self.method == "superdiff":
            if self.mode not in _SD_MODES:
                raise ValueError(f"mode must be one of {_SD_MODES}")
            if self.guidance != 1.0:
                raise ValueError("guidance does not apply to superdiff "
                                 "(the mixture IS the conditioning)")
        steps = (int(T) if self.method in ("ddpm", "superdiff")
                 else int(self.steps))
        if not 1 <= steps <= T:
            raise ValueError(f"steps must be in [1, {T}]")
        mode = self.mode if self.method == "superdiff" else "or"
        return SampleSpec(self.method, steps, float(self.eta),
                          float(self.guidance), mode)

    def validate(self, T: int) -> None:
        self.canonical(T)


@dataclass
class _Request:
    num: int
    labels: np.ndarray            # (num,) int32 (null label when uncond)
    spec: SampleSpec
    seed: Optional[int]
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    logq: Optional[np.ndarray] = None   # (2, num) Itô log-densities (superdiff)
    error: Optional[Exception] = None


class SamplerService:
    """Micro-batching sampler around one loaded model.

    ``submit`` is non-blocking (returns a ``_Request`` handle), ``sample``
    blocks. The worker thread drains the queue; ``autostart=False`` plus
    ``step_once()`` gives tests a deterministic single-threaded drain.
    """

    def __init__(self, model, schedule, params, resolution: int,
                 conditional: bool, batch_size: int = 16,
                 max_wait_ms: float = 20.0, autostart: bool = True,
                 mesh=None, params2=None, model2=None,
                 t_spacing: str = "leading", clip_x0: bool = True):
        import jax

        if t_spacing not in ("leading", "trailing"):
            raise ValueError(f"t_spacing must be leading/trailing, got "
                             f"{t_spacing!r}")
        # run-level grid policy, not a request knob: a progressively
        # distilled student is only trained at its trailing grid nodes
        # (cli/distill.py stamps sampling.t_spacing='trailing' into its
        # exported config) — serving it on the leading grid would sample
        # off-manifold. clip_x0 is run-level for the same reason: students
        # train against the UNclipped one-step transition (stamped False),
        # clamping their x0 predictions would execute a different map.
        self._t_spacing = t_spacing
        self._clip_x0 = bool(clip_x0)
        self._model = model
        self._schedule = schedule
        self._resolution = int(resolution)
        self._conditional = bool(conditional)
        self._B = int(batch_size)
        self._max_wait = max_wait_ms / 1e3
        self._mesh = mesh
        self._params = self._place(params)
        # optional second model: enables method="superdiff" (the namesake
        # capability, served online — sequential per-model closures, the
        # production arrangement cli/sample.py ships)
        self._model2 = model2 if model2 is not None else model
        self._params2 = self._place(params2) if params2 is not None else None
        self._null = int(getattr(model, "null_label", 0))
        self._num_classes = int(getattr(model, "num_classes", 0) or 0)

        self._jits: Dict[SampleSpec, Any] = {}
        self._q: "queue.Queue[_Request]" = queue.Queue()
        # Requests pulled off the queue but not servable in the current
        # batch (different spec, or seeded). Worker-thread-only state,
        # FIFO by arrival: the oldest deferred request leads the next
        # cycle, so a minority spec is never starved by a sustained
        # stream of another spec.
        self._pending: List[_Request] = []
        self._lock = threading.Lock()
        self.stats = {"requests": 0, "samples": 0, "batches": 0,
                      "coalesced": 0, "compiles": 0, "device_ms_total": 0.0}
        self._stop = threading.Event()
        self._thread = None
        if autostart:
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()

    # ------------------------------------------------------------- public
    @property
    def batch_size(self) -> int:
        return self._B

    @property
    def resolution(self) -> int:
        return self._resolution

    def submit(self, num: int, label: Optional[int] = None,
               spec: Optional[SampleSpec] = None,
               seed: Optional[int] = None) -> _Request:
        spec = (spec or SampleSpec()).canonical(
            int(self._schedule.betas.shape[0]))
        if spec.method == "superdiff" and self._params2 is None:
            raise ValueError("service holds one model; superdiff needs a "
                             "second (--run-dir2)")
        if not self._conditional and spec.guidance != 1.0:
            # guidance never reaches the unconditional sampler; fold it so
            # clients varying it don't each compile an identical executable
            spec = SampleSpec(spec.method, spec.steps, spec.eta, 1.0,
                              spec.mode)
        if not 1 <= num <= self._B:
            raise ValueError(f"num must be in [1, {self._B}] "
                             "(the service's fixed batch size)")
        if label is not None and not self._conditional:
            raise ValueError("model is unconditional; omit label")
        if label is not None and self._num_classes \
                and not 0 <= int(label) < self._num_classes:
            # jnp.take clamps out-of-range gathers, which would silently
            # condition on the wrong class; reject at the boundary instead
            raise ValueError(f"label must be in [0, {self._num_classes})")
        lab = self._null if label is None else int(label)
        req = _Request(num=num,
                       labels=np.full((num,), lab, dtype=np.int32),
                       spec=spec, seed=seed)
        with self._lock:
            self.stats["requests"] += 1
        self._q.put(req)
        return req

    def sample_request(self, num: int, label: Optional[int] = None,
                       spec: Optional[SampleSpec] = None,
                       seed: Optional[int] = None,
                       timeout: float = 600.0) -> _Request:
        """Blocking submit: returns the completed request (``result`` +
        ``logq`` for superdiff specs), raising its error/timeout."""
        req = self.submit(num, label=label, spec=spec, seed=seed)
        if not req.done.wait(timeout):
            raise TimeoutError("sampling request timed out")
        if req.error is not None:
            raise req.error
        return req

    def sample(self, num: int, label: Optional[int] = None,
               spec: Optional[SampleSpec] = None,
               seed: Optional[int] = None,
               timeout: float = 600.0) -> np.ndarray:
        return self.sample_request(num, label=label, spec=spec, seed=seed,
                                   timeout=timeout).result

    def warmup(self, spec: Optional[SampleSpec] = None) -> float:
        """Compile + run one batch of ``spec`` so the first real request
        pays steady-state latency. Returns seconds spent."""
        tic = time.time()
        self.sample(1, spec=spec, seed=0)
        return time.time() - tic

    def step_once(self, block: bool = True) -> int:
        """Drain one coalesced batch (test/diagnostic path). Returns the
        number of requests served."""
        first = self._next_request(block)
        if first is None:
            return 0
        return self._serve_batch(first)

    def close(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)

    # ------------------------------------------------------------ worker
    def _run(self) -> None:
        while not self._stop.is_set():
            first = self._next_request(block=True, timeout=0.1)
            if first is None:
                continue
            try:
                self._serve_batch(first)
            except Exception:       # worker must survive bad launches;
                # the requests already carry the error (``_serve_batch``
                # sets it before re-raising) — record it server-side too
                _log.exception("sampling batch failed")

    def _next_request(self, block: bool = True,
                      timeout: Optional[float] = None) -> Optional[_Request]:
        """Oldest deferred request first, then the queue (worker thread /
        ``step_once`` only)."""
        if self._pending:
            return self._pending.pop(0)
        try:
            return self._q.get(block=block, timeout=timeout
                               if timeout is not None
                               else (self._max_wait if block else None))
        except queue.Empty:
            return None

    def _serve_batch(self, first: _Request) -> int:
        """Coalesce waiting unseeded requests sharing ``first.spec`` into
        one launch. Seeded requests always ride alone: their result must
        depend only on (spec, num, label, seed, batch_size), never on what
        else happened to be queued. Non-matching requests are deferred to
        ``_pending`` in arrival order and lead the next cycle."""
        batch: List[_Request] = [first]
        slots = first.num
        if first.seed is None:
            kept: List[_Request] = []
            for r in self._pending:       # older deferred matches first
                if (r.seed is None and r.spec == first.spec
                        and slots + r.num <= self._B):
                    batch.append(r)
                    slots += r.num
                else:
                    kept.append(r)
            self._pending = kept
            deadline = time.time() + self._max_wait
            while slots < self._B and time.time() < deadline:
                try:
                    nxt = self._q.get(
                        timeout=max(0.0, deadline - time.time()))
                except queue.Empty:
                    break
                if (nxt.seed is None and nxt.spec == first.spec
                        and slots + nxt.num <= self._B):
                    batch.append(nxt)
                    slots += nxt.num
                else:
                    self._pending.append(nxt)

        labels = np.full((self._B,), self._null, dtype=np.int32)
        off = 0
        for r in batch:
            labels[off:off + r.num] = r.labels
            off += r.num
        # unseeded batches draw a fresh seed (never colliding with the
        # deterministic space of explicit client seeds by counter reuse)
        seed = (first.seed if first.seed is not None
                else int.from_bytes(os.urandom(4), "little"))

        try:
            imgs, logq = self._launch(first.spec, labels, int(seed))
        except Exception as e:
            for r in batch:
                r.error = e
                r.done.set()
            raise
        off = 0
        for r in batch:
            r.result = imgs[off:off + r.num]
            if logq is not None:
                r.logq = logq[:, off:off + r.num]
            off += r.num
            r.done.set()
        with self._lock:
            self.stats["batches"] += 1
            self.stats["samples"] += slots
            self.stats["coalesced"] += len(batch) - 1
        return len(batch)

    # ------------------------------------------------------------ device
    def _place(self, params):
        import jax

        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            return jax.device_put(
                params, NamedSharding(self._mesh, PartitionSpec()))
        return jax.device_put(params)

    def _get_jit(self, spec: SampleSpec):
        import jax

        fn = self._jits.get(spec)
        if fn is not None:
            return fn

        from superdiff_tpu.diffusion import (ddim_sample, ddpm_sample,
                                             dpmpp_sample)
        from superdiff_tpu.inference import make_eps_fn_p

        shape = (self._B, self._resolution, self._resolution, 1)
        schedule = self._schedule
        if spec.method == "superdiff":
            from superdiff_tpu.diffusion.superdiff import superdiff_sample

            lab = "per_sample" if self._conditional else None
            a1 = make_eps_fn_p(self._model, lab, schedule=schedule)
            a2 = make_eps_fn_p(self._model2, lab, schedule=schedule)

            def sd_sampler(rng, p1, p2, y):
                if self._conditional:
                    fns = [lambda xx, tt: a1(p1, xx, tt, y),
                           lambda xx, tt: a2(p2, xx, tt, y)]
                else:
                    fns = [lambda xx, tt: a1(p1, xx, tt),
                           lambda xx, tt: a2(p2, xx, tt)]
                return superdiff_sample(schedule, fns, shape, rng,
                                        mode=spec.mode)

            if self._mesh is not None:
                from superdiff_tpu.parallel import shard_sample
                fn = shard_sample(sd_sampler, self._mesh, with_logq=True)
            else:
                fn = jax.jit(sd_sampler)
            self._jits[spec] = fn
            with self._lock:
                self.stats["compiles"] += 1
            return fn
        if self._conditional:
            applyp = make_eps_fn_p(self._model, "per_sample",
                                   schedule=schedule)

            def build(p, y):
                extra = dict(y=y, guidance_scale=spec.guidance,
                             null_label=self._null)
                eps = lambda *a: applyp(p, *a)
                return eps, extra
        else:
            applyp = make_eps_fn_p(self._model, schedule=schedule)

            def build(p, y):
                return (lambda *a: applyp(p, *a)), {}

        def sampler(rng, p, y):
            eps, extra = build(p, y)
            if spec.method == "ddim":
                return ddim_sample(schedule, eps, shape, rng,
                                   num_steps=spec.steps, eta=spec.eta,
                                   t_spacing=self._t_spacing,
                                   clip_x0=self._clip_x0, **extra)
            if spec.method == "dpmpp":
                return dpmpp_sample(schedule, eps, shape, rng,
                                    num_steps=spec.steps,
                                    clip_x0=self._clip_x0, **extra)
            return ddpm_sample(schedule, eps, shape, rng, **extra)

        if self._mesh is not None:
            from superdiff_tpu.parallel import shard_sample
            fn = shard_sample(sampler, self._mesh)
        else:
            fn = jax.jit(sampler)
        self._jits[spec] = fn
        with self._lock:
            self.stats["compiles"] += 1
        return fn

    def _launch(self, spec: SampleSpec, labels: np.ndarray,
                seed: int) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Returns ``(images, logq)`` — ``logq`` is the (2, B) Itô
        log-density matrix for superdiff specs, None otherwise."""
        import jax
        import jax.numpy as jnp

        fn = self._get_jit(spec)
        tic = time.time()
        logq = None
        if spec.method == "superdiff":
            out, logq = fn(jax.random.PRNGKey(seed), self._params,
                           self._params2, jnp.asarray(labels))
        else:
            out = fn(jax.random.PRNGKey(seed), self._params,
                     jnp.asarray(labels))
        out.block_until_ready()
        with self._lock:
            self.stats["device_ms_total"] += (time.time() - tic) * 1e3
        return (np.asarray(out, dtype=np.float32),
                None if logq is None else np.asarray(logq, np.float32))


# ------------------------------------------------------------------ HTTP
def encode_images(imgs: np.ndarray, fmt: str = "png") -> Tuple[str, str]:
    """Encode a (N, H, W, 1) float batch. Returns (base64, content_type).

    ``png``: one horizontal grid, [-1, 1] -> uint8. ``npy``: the raw float32
    array serialized with ``np.save`` (lossless, machine-consumable)."""
    if fmt == "npy":
        buf = io.BytesIO()
        np.save(buf, imgs)
        return (base64.b64encode(buf.getvalue()).decode("ascii"),
                "application/x-npy")
    if fmt != "png":
        raise ValueError("format must be 'png' or 'npy'")
    from PIL import Image

    u8 = (np.clip((imgs[..., 0] + 1.0) / 2.0, 0.0, 1.0) * 255
          ).astype(np.uint8)                       # (N, H, W)
    grid = np.concatenate(list(u8), axis=1)        # (H, N*W)
    buf = io.BytesIO()
    Image.fromarray(grid, mode="L").save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii"), "image/png"


def make_http_server(service: SamplerService, host: str = "127.0.0.1",
                     port: int = 8000, info: Optional[dict] = None):
    """Build (not start) a ThreadingHTTPServer exposing the service.

    Routes: ``GET /healthz``, ``GET /info``, ``GET /metrics``,
    ``POST /sample`` with JSON
    ``{num, label?, method?, steps?, eta?, guidance?, seed?, format?}``.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    info = dict(info or {})

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):      # quiet; metrics replace access logs
            pass

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            import jax

            if self.path == "/healthz":
                self._json(200, {"status": "ok",
                                 "backend": jax.default_backend(),
                                 "devices": len(jax.devices())})
            elif self.path == "/info":
                superposed = service._params2 is not None
                methods = [m for m in _METHODS
                           if m != "superdiff" or superposed]
                self._json(200, {
                    "resolution": service.resolution,
                    "batch_size": service.batch_size,
                    "t_spacing": service._t_spacing,
                    "clip_x0": service._clip_x0,
                    "methods": methods,
                    "superdiff_modes": list(_SD_MODES) if superposed else [],
                    "conditional": service._conditional, **info})
            elif self.path == "/metrics":
                self._json(200, dict(service.stats))
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/sample":
                return self._json(404, {"error": f"no route {self.path}"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                spec = SampleSpec(
                    method=body.get("method", "ddim"),
                    steps=int(body.get("steps",
                                       50 if body.get("method", "ddim")
                                       != "dpmpp" else 10)),
                    eta=float(body.get("eta", 0.0)),
                    guidance=float(body.get("guidance", 1.0)),
                    mode=body.get("mode", "or"))
                req = service.sample_request(
                    int(body.get("num", 1)),
                    label=body.get("label"),
                    spec=spec, seed=body.get("seed"))
                imgs = req.result
                fmt = body.get("format", "png")
                data, ctype = encode_images(imgs, fmt)
                payload = {"num": int(imgs.shape[0]),
                           "shape": list(imgs.shape),
                           "content_type": ctype, "data": data}
                if req.logq is not None:
                    # per-sample Itô log-densities under each model — the
                    # superposition diagnostic (which model "owns" a sample)
                    payload["logq"] = [[float(v) for v in row]
                                       for row in req.logq]
                self._json(200, payload)
            except (ValueError, KeyError, TypeError) as e:
                self._json(400, {"error": str(e)})
            except TimeoutError as e:
                self._json(503, {"error": str(e)})
            except Exception as e:
                # device/runtime failures (XLA OOM, backend outage, ...)
                # must surface as a 5xx JSON error, not a dropped socket
                _log.exception("/sample failed")
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)
