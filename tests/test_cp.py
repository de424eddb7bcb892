"""Ring-attention (context-parallel) tests on the 8-device CPU mesh.

``parallel/cp.py`` rotates K/V shards around the mesh with ppermute while
accumulating the flash online softmax — the multi-chip half of SURVEY.md
§5.7's long-context mandate. Pins value AND gradient parity vs the
single-device XLA attention, plus genuine 1/N sequence residency.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superdiff_tpu.ops.attention import _xla_attention
from superdiff_tpu.parallel import make_mesh
from superdiff_tpu.parallel.cp import ring_attention, shard_sequence

B, S, H, D = 2, 64, 2, 16


def _qkv(seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (B, S, H, D)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


def test_ring_matches_single_device():
    mesh = make_mesh()                                   # data=8
    q, k, v = _qkv()
    ref = _xla_attention(q, k, v)
    out = ring_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_on_model_axis_and_sharded_inputs():
    mesh = make_mesh(model_parallelism=4)                # (data=2, model=4)
    q, k, v = _qkv(seed=1)
    ref = _xla_attention(q, k, v)
    qs, ks, vs = (shard_sequence(a, mesh, axis="model") for a in (q, k, v))
    # inputs arrive already S-sharded: each device holds S/4 of K/V
    assert ks.addressable_shards[0].data.shape[1] == S // 4
    out = ring_attention(qs, ks, vs, mesh, axis="model")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # output stays S-sharded (resident layout between attention calls)
    assert out.addressable_shards[0].data.shape[1] == S // 4


def test_ring_gradient_parity():
    """d(out·g)/d(q,k,v) must match the single-device path — the ring is
    differentiable straight through ppermute/scan."""
    mesh = make_mesh()
    q, k, v = _qkv(seed=2)
    g = jax.random.normal(jax.random.PRNGKey(9), q.shape)

    def loss_ref(q, k, v):
        return jnp.vdot(_xla_attention(q, k, v), g)

    def loss_ring(q, k, v):
        return jnp.vdot(ring_attention(q, k, v, mesh), g)

    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    ring_grads = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(ref_grads, ring_grads, "qkv"):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=5e-5, err_msg=name)


def test_ring_bf16_inputs():
    """bf16 Q/K/V (the production compute dtype): f32 accumulation inside,
    bf16 out, close to the f32 reference at bf16 tolerance."""
    mesh = make_mesh()
    q, k, v = _qkv(seed=3, dtype=jnp.bfloat16)
    ref = _xla_attention(q, k, v)
    out = ring_attention(q, k, v, mesh)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_ring_rejects_nondivisible_sequence():
    mesh = make_mesh()
    q = jnp.zeros((1, 12, 1, 8))
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q, q, q, mesh)


def test_ring_never_materializes_score_matrix():
    """VERDICT r3 #5: execute ring attention at a sequence length whose
    score matrix provably exceeds a set bound, and assert — from XLA's own
    compiled memory analysis, not prose — that the ring path's temp
    allocation stays orders of magnitude below it while the naive path
    must materialize at least the full (B, H, S, S) block.

    S=4096, B=1, H=2: scores = 1*2*4096^2 f32 = 128 MiB. The ring path on
    the 8-device mesh holds 512-row K/V shards per hop; its temporaries
    must stay under 16 MiB/device. Parity is pinned against a q-chunked
    reference that also never materializes the full matrix."""
    S_big, Bq, Hq, Dq = 4096, 1, 2, 16
    score_bytes = Bq * Hq * S_big * S_big * 4            # 128 MiB
    bound = 128 * 2**20
    assert score_bytes >= bound

    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q, k, v = (jax.random.normal(kk, (Bq, S_big, Hq, Dq), jnp.float32)
               for kk in ks)

    mesh = make_mesh()
    ring = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh=mesh))
    compiled = ring.lower(q, k, v).compile()
    mem = compiled.memory_analysis()
    if mem is not None and getattr(mem, "temp_size_in_bytes", 0):
        ring_temp = int(mem.temp_size_in_bytes)
        # per-device residency: CPU "devices" share one arena, so compare
        # the whole-program temp against the bound
        assert ring_temp < bound // 8, (
            f"ring temp {ring_temp/2**20:.0f} MiB should be far below the "
            f"{bound/2**20:.0f} MiB score matrix")

        naive = jax.jit(lambda q, k, v: _xla_attention(q, k, v))
        nmem = naive.lower(q, k, v).compile().memory_analysis()
        if nmem is not None and getattr(nmem, "temp_size_in_bytes", 0):
            assert int(nmem.temp_size_in_bytes) >= score_bytes

    out = ring(q, k, v)

    # q-chunked reference: full-precision attention, never holding more
    # than (chunk, S) scores at once
    chunk = 512
    outs = []
    for i in range(0, S_big, chunk):
        outs.append(_xla_attention(q[:, i:i + chunk], k, v))
    ref = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
