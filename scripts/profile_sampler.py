"""Profile the eff256 sampler on the real chip and print the per-op time
breakdown of one denoiser step.

Captures a ``jax.profiler`` trace of a short (T=100) DDPM scan under the
production sampling dtype policy, then parses the xplane protobuf with the
TF ``xplane_pb2`` schema baked into this image (no TensorBoard needed) and
aggregates device-plane event durations by HLO-op category. This is the
measurement behind BASELINE.md's "where the fixed 3.1 ms lives" table:
XLA's HLO cost analysis says which ops carry FLOPs, the trace says which
ops carry *time* — the difference is the HBM-bound slice worth fusing.

    python scripts/profile_sampler.py [preset] > /tmp/profile.json 2>/tmp/profile.log
"""

import collections
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/tpu_profile"
T = 100
BATCH = 16
RES = 256


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def capture(preset):
    import jax
    import jax.numpy as jnp
    from superdiff_tpu.diffusion import make_schedule, ddpm_sample
    from superdiff_tpu.inference import cast_sampling_params
    from superdiff_tpu.models.presets import build_model
    from superdiff_tpu.utils.env import host_init

    model = build_model(preset, num_classes=2, norm_dtype=jnp.bfloat16)
    shape = (BATCH, RES, RES, 1)
    y = jnp.zeros((BATCH,), dtype=jnp.int32)
    x = jnp.zeros(shape, dtype=jnp.float32)
    t0 = jnp.zeros((BATCH,), dtype=jnp.int32)
    params = cast_sampling_params(
        host_init(model.init, jax.random.PRNGKey(0), x, t0, y))

    schedule = make_schedule(T)
    fn = lambda xx, tt, yy: model.apply(params, xx, tt, yy)
    sample = jax.jit(lambda r: ddpm_sample(
        schedule, fn, shape, r, y=y, guidance_scale=1.0))

    tic = time.time()
    sample(jax.random.PRNGKey(1)).block_until_ready()
    log(f"compile+first: {time.time()-tic:.0f}s")
    tic = time.time()
    sample(jax.random.PRNGKey(2)).block_until_ready()
    steady = time.time() - tic
    log(f"steady: {steady:.2f}s ({steady/T*1e3:.2f} ms/step)")

    jax.profiler.start_trace(TRACE_DIR)
    sample(jax.random.PRNGKey(3)).block_until_ready()
    jax.profiler.stop_trace()
    log("trace captured")
    return steady


def _categorize(name: str) -> str:
    """Map a leaf HLO op name (pre-`=` part) to a coarse category.

    Naming observed on the v5e trace: Pallas kernels keep their module-
    path name (e.g. ``%down_2_attn_0.8``), GroupNorm statistic+normalize
    chains lower to ``%convert_reduce_fusion.N``, convs to
    ``%fusion.N``/``%convolution_add_fusion.N`` with the kernel operand
    inside."""
    n = name.lower().lstrip("%")
    if "attn" in n or "flash" in n or "pallas" in n:
        return "pallas-flash-attention"
    if n.startswith(("convert_reduce_fusion", "reduce")):
        return "norm-stats+normalize (reduce fusions)"
    if "convolution" in n or n.startswith("conv"):
        return "convolution(+fused epilogue)"
    if n.startswith("fusion"):
        return "fusion (convs + elementwise)"
    if "dot" in n:
        return "matmul"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/transpose"
    if "concatenate" in n:
        return "concatenate"
    if "rng" in n or "threefry" in n:
        return "rng"
    return "other"


def parse(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = []
    for dp, _, fns in os.walk(trace_dir):
        for f in fns:
            if f.endswith(".xplane.pb"):
                pbs.append(os.path.join(dp, f))
    if not pbs:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    pb = max(pbs, key=os.path.getmtime)
    log(f"parsing {pb}")
    xspace = xplane_pb2.XSpace()
    with open(pb, "rb") as fh:
        xspace.ParseFromString(fh.read())

    by_name = collections.Counter()
    by_cat = collections.Counter()
    device_planes = [p for p in xspace.planes if "TPU" in p.name]
    log("planes: " + "; ".join(p.name for p in xspace.planes))
    for plane in device_planes:
        ev_names = dict(plane.event_metadata.items())
        for line in plane.lines:
            # Exactly the "XLA Ops" line (leaf per-HLO durations). The
            # "XLA Modules" line is the whole program, "Async XLA Ops" are
            # overlapped DMAs — both double-count against leaf time.
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                meta = ev_names.get(ev.metadata_id)
                name = meta.name if meta else str(ev.metadata_id)
                # control-flow wrappers span their whole bodies; leaf ops
                # are already counted individually.
                if name.startswith(("%while", "%body", "%cond", "%wide")):
                    continue
                dur_us = ev.duration_ps / 1e6
                by_name[name.split(" = ")[0]] += dur_us
                by_cat[_categorize(name.split(" = ")[0])] += dur_us
    return by_name, by_cat


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "eff256"
    steady = capture(preset)
    by_name, by_cat = parse(TRACE_DIR)
    total = sum(by_cat.values())
    log(f"total device time in trace: {total/1e3:.1f} ms "
        f"({total/1e3/T:.3f} ms/step)")
    out = {
        "preset": preset,
        "steady_ms_per_step": round(steady / T * 1e3, 3),
        "device_ms_per_step": round(total / 1e3 / T, 3),
        "by_category_ms_per_step": {
            k: round(v / 1e3 / T, 4)
            for k, v in by_cat.most_common()},
        "top_ops_ms_per_step": {
            k: round(v / 1e3 / T, 4)
            for k, v in by_name.most_common(40)},
    }
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
