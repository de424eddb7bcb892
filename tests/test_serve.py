"""Serving subsystem tests (CPU): micro-batching, HTTP app, encoders.

The reference has no serving surface at all (``src/sampling.py`` is an
empty stub, SURVEY.md §2.3); these pin the new online path: fixed-shape
executables, deterministic request coalescing (autostart=False +
step_once), per-slot class labels, and the stdlib HTTP app end-to-end on
an ephemeral port.
"""

import base64
import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superdiff_tpu.diffusion import make_schedule
from superdiff_tpu.models import CondUNet
from superdiff_tpu.serve import (SamplerService, SampleSpec, encode_images,
                                 make_http_server)

RES = 16
B = 4


def _model_params():
    model = CondUNet(base_channels=8, channel_mults=(1, 2),
                     num_res_blocks=1, attn_resolutions=(), num_classes=2,
                     time_emb_dim=16, groups=4)
    x = jnp.zeros((B, RES, RES, 1))
    t = jnp.zeros((B,), jnp.int32)
    y = jnp.zeros((B,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, y)
    return model, params


@pytest.fixture(scope="module")
def service():
    model, params = _model_params()
    svc = SamplerService(model, make_schedule(20), params, resolution=RES,
                         conditional=True, batch_size=B, max_wait_ms=5.0,
                         autostart=False)
    yield svc
    svc.close()


FAST = SampleSpec(method="ddim", steps=2)


def test_validation(service):
    with pytest.raises(ValueError):
        service.submit(B + 1, spec=FAST)               # over capacity
    with pytest.raises(ValueError):
        service.submit(1, spec=SampleSpec(method="nope"))
    with pytest.raises(ValueError):
        service.submit(1, spec=SampleSpec(method="dpmpp", eta=0.5))
    with pytest.raises(ValueError):
        service.submit(1, spec=SampleSpec(method="ddpm", eta=0.5))
    with pytest.raises(ValueError):
        service.submit(1, spec=SampleSpec(steps=999))  # > T
    with pytest.raises(ValueError):
        service.submit(1, label=99, spec=FAST)         # >= num_classes
    with pytest.raises(ValueError):
        service.submit(1, label=-1, spec=FAST)


def test_spec_canonicalization():
    # fields a method ignores must fold to one executable-cache key
    a = SampleSpec(method="ddpm", steps=5).canonical(20)
    b = SampleSpec(method="ddpm", steps=7).canonical(20)
    assert a == b and a.steps == 20
    assert SampleSpec(method="ddim", steps=5).canonical(20).steps == 5


def test_coalescing_and_slicing(service):
    r1 = service.submit(2, label=0, spec=FAST)
    r2 = service.submit(2, label=1, spec=FAST)
    served = service.step_once()
    assert served == 2
    assert service.stats["batches"] >= 1
    assert service.stats["coalesced"] >= 1
    for r in (r1, r2):
        assert r.done.is_set() and r.error is None
        assert r.result.shape == (2, RES, RES, 1)
        assert np.isfinite(r.result).all()
    # both rode ONE launch (same rng) but different class labels -> the
    # per-slot y vector must make the outputs differ
    assert not np.allclose(r1.result, r2.result)


def test_specs_do_not_mix(service):
    slow = SampleSpec(method="ddim", steps=3)
    ra = service.submit(1, spec=FAST)
    rb = service.submit(1, spec=slow)
    before = service.stats["batches"]
    assert service.step_once() == 1          # only the FAST one
    assert ra.done.is_set() and not rb.done.is_set()
    # the deferred minority spec must lead the NEXT cycle even when more
    # majority-spec traffic arrived behind it (no starvation)
    rc = service.submit(1, spec=FAST)
    assert service.step_once() == 1
    assert rb.done.is_set() and rb.error is None and not rc.done.is_set()
    assert service.step_once() == 1
    assert rc.done.is_set()
    assert service.stats["batches"] == before + 3


def test_seeded_requests_reproduce(service):
    # a seeded request rides alone (never coalesced), so its result
    # depends only on (spec, num, label, seed, batch_size)
    ra = service.submit(2, label=0, spec=FAST, seed=7)
    rb = service.submit(1, label=1, spec=FAST)       # unseeded bystander
    assert service.step_once() == 1                  # seeded one, alone
    assert ra.done.is_set() and not rb.done.is_set()
    assert service.step_once() == 1
    assert rb.done.is_set()

    rc = service.submit(2, label=0, spec=FAST, seed=7)
    service.step_once()
    np.testing.assert_array_equal(ra.result, rc.result)

    rd = service.submit(2, label=0, spec=FAST, seed=8)
    service.step_once()
    assert not np.allclose(ra.result, rd.result)


def test_unconditional_service_rejects_label():
    model, params = _model_params()
    svc = SamplerService(model, make_schedule(20), params, resolution=RES,
                         conditional=False, batch_size=B, autostart=False)
    with pytest.raises(ValueError):
        svc.submit(1, label=1, spec=FAST)
    svc.close()


def test_encode_images_roundtrip():
    imgs = np.linspace(-1, 1, 2 * RES * RES, dtype=np.float32
                       ).reshape(2, RES, RES, 1)
    data, ctype = encode_images(imgs, "npy")
    assert ctype == "application/x-npy"
    back = np.load(io.BytesIO(base64.b64decode(data)))
    np.testing.assert_array_equal(back, imgs)

    data, ctype = encode_images(imgs, "png")
    assert ctype == "image/png"
    raw = base64.b64decode(data)
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    with pytest.raises(ValueError):
        encode_images(imgs, "jpeg")


def test_http_end_to_end():
    model, params = _model_params()
    svc = SamplerService(model, make_schedule(20), params, resolution=RES,
                         conditional=True, batch_size=B, max_wait_ms=5.0,
                         autostart=True)
    httpd = make_http_server(svc, "127.0.0.1", 0, info={"preset": "tiny"})
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{port}"
    try:
        h = json.load(urllib.request.urlopen(f"{base}/healthz"))
        assert h["status"] == "ok" and h["backend"] == "cpu"
        inf = json.load(urllib.request.urlopen(f"{base}/info"))
        assert inf["resolution"] == RES and inf["batch_size"] == B
        assert inf["preset"] == "tiny" and inf["conditional"] is True

        body = json.dumps({"num": 2, "label": 1, "method": "ddim",
                           "steps": 2, "format": "npy",
                           "seed": 3}).encode()
        resp = json.load(urllib.request.urlopen(
            urllib.request.Request(f"{base}/sample", data=body,
                                   method="POST")))
        assert resp["shape"] == [2, RES, RES, 1]
        arr = np.load(io.BytesIO(base64.b64decode(resp["data"])))
        assert arr.shape == (2, RES, RES, 1) and np.isfinite(arr).all()

        # bad request -> 400 with an error payload
        bad = urllib.request.Request(
            f"{base}/sample",
            data=json.dumps({"num": 99, "steps": 2}).encode(),
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad)
        assert ei.value.code == 400
        assert "num" in json.load(ei.value)["error"]

        m = json.load(urllib.request.urlopen(f"{base}/metrics"))
        assert m["samples"] >= 2 and m["batches"] >= 1
    finally:
        httpd.shutdown()
        svc.close()


def _second_params(model):
    x = jnp.zeros((B, RES, RES, 1))
    t = jnp.zeros((B,), jnp.int32)
    y = jnp.zeros((B,), jnp.int32)
    return model.init(jax.random.PRNGKey(11), x, t, y)


@pytest.fixture(scope="module")
def sd_service():
    model, params = _model_params()
    svc = SamplerService(model, make_schedule(20), params, resolution=RES,
                         conditional=True, batch_size=B, max_wait_ms=5.0,
                         autostart=False, params2=_second_params(model))
    yield svc
    svc.close()


def test_superdiff_serving(sd_service):
    """method=superdiff serves superposed samples with per-request Itô
    log-densities sliced out of the coalesced launch."""
    spec = SampleSpec(method="superdiff", mode="or")
    r1 = sd_service.submit(2, label=0, spec=spec)
    r2 = sd_service.submit(1, label=1, spec=spec)
    assert sd_service.step_once() == 2                 # coalesced
    for r, n in ((r1, 2), (r2, 1)):
        assert r.done.is_set() and r.error is None
        assert r.result.shape == (n, RES, RES, 1)
        assert np.isfinite(r.result).all()
        assert r.logq is not None and r.logq.shape == (2, n)
        assert np.isfinite(r.logq).all()

    # AND mode compiles its own executable and equalizes the densities
    r3 = sd_service.submit(2, spec=SampleSpec(method="superdiff",
                                              mode="and"))
    assert sd_service.step_once() == 1
    assert r3.error is None and r3.logq.shape == (2, 2)
    gap = np.abs(r3.logq[0] - r3.logq[1]).max()
    assert gap < 5.0, gap       # T=20 toy schedule: small, not exact

    # single-model specs still carry no logq
    r4 = sd_service.submit(1, spec=FAST)
    sd_service.step_once()
    assert r4.logq is None


def test_superdiff_spec_validation(service, sd_service):
    # one-model service refuses superposition
    with pytest.raises(ValueError, match="second"):
        service.submit(1, spec=SampleSpec(method="superdiff"))
    # bad mode / eta / guidance rejected at the boundary
    with pytest.raises(ValueError, match="mode"):
        sd_service.submit(1, spec=SampleSpec(method="superdiff",
                                             mode="xor"))
    with pytest.raises(ValueError, match="eta"):
        sd_service.submit(1, spec=SampleSpec(method="superdiff", eta=0.3))
    with pytest.raises(ValueError, match="guidance"):
        sd_service.submit(1, spec=SampleSpec(method="superdiff",
                                             guidance=2.0))
    # steps fold to T and mode folds to "or" for non-superdiff methods
    a = SampleSpec(method="superdiff", steps=3).canonical(20)
    assert a.steps == 20 and a.mode == "or"
    b = SampleSpec(method="ddim", steps=5, mode="and").canonical(20)
    assert b.mode == "or"


def test_superdiff_http(sd_service):
    httpd = make_http_server(sd_service, "127.0.0.1", 0)
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{port}"
    drain = threading.Thread(
        target=lambda: [sd_service.step_once(block=True) for _ in range(1)],
        daemon=True)
    drain.start()
    try:
        inf = json.load(urllib.request.urlopen(f"{base}/info"))
        assert "superdiff" in inf["methods"]
        assert inf["superdiff_modes"] == ["or", "and"]
        body = json.dumps({"num": 2, "method": "superdiff", "mode": "or",
                           "format": "npy", "seed": 5}).encode()
        resp = json.load(urllib.request.urlopen(
            urllib.request.Request(f"{base}/sample", data=body,
                                   method="POST")))
        assert resp["shape"] == [2, RES, RES, 1]
        assert len(resp["logq"]) == 2 and len(resp["logq"][0]) == 2
        assert all(np.isfinite(v) for row in resp["logq"] for v in row)
    finally:
        httpd.shutdown()


def test_trailing_spacing_service():
    """A service built with t_spacing='trailing' (what a distilled
    student's config stamps) samples on the trailing grid — a 1-step DDIM
    spec is then exactly one model call at t = T-1 — and bad spacings are
    rejected at construction."""
    model, params = _model_params()
    svc = SamplerService(model, make_schedule(20), params, resolution=RES,
                         conditional=True, batch_size=B, max_wait_ms=5.0,
                         autostart=False, t_spacing="trailing")
    try:
        req = svc.submit(2, spec=SampleSpec(method="ddim", steps=1))
        svc.step_once()
        assert req.done.is_set()
        assert req.result.shape == (2, RES, RES, 1)
        assert np.isfinite(req.result).all()
    finally:
        svc.close()
    with pytest.raises(ValueError, match="t_spacing"):
        SamplerService(model, make_schedule(20), params, resolution=RES,
                       conditional=True, batch_size=B, autostart=False,
                       t_spacing="sideways")
