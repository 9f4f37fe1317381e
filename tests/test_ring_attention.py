"""Ring (sequence-sharded) attention vs exact softmax attention.

The ring path is the multi-chip fallback for long self-attention whose head
count does not divide the mesh (ops/attention.py routing); these tests run
it on the 8 virtual CPU devices from conftest and assert numerical identity
with the plain einsum reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evoworld_tpu.ops import attention as att
from evoworld_tpu.ops.attention import _xla_attention, multi_head_attention
from evoworld_tpu.ops.ring_attention import seq_sharded_ring
from evoworld_tpu.parallel.mesh import make_mesh


def _rand_qkv(rng, b, s, h, d, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype)
    return q, k, v


class TestRingAttention:
    def test_matches_exact_divisible(self):
        """S divides the 8-ring; heads (3) don't divide the mesh."""
        rng = np.random.default_rng(0)
        q, k, v = _rand_qkv(rng, 2, 8 * 37, 3, 16)
        mesh = make_mesh(data=8, model=1)
        scale = 1.0 / 4.0
        got = seq_sharded_ring(q, k, v, scale, mesh)
        ref = _xla_attention(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_matches_exact_padded(self):
        """S = 301 does NOT divide the ring: wrapper pads + masks."""
        rng = np.random.default_rng(1)
        q, k, v = _rand_qkv(rng, 1, 301, 5, 8)
        mesh = make_mesh(data=8, model=1)
        scale = 1.0 / (8.0**0.5)
        got = seq_sharded_ring(q, k, v, scale, mesh)
        assert got.shape == q.shape
        ref = _xla_attention(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_matches_exact_two_axis_mesh(self):
        """Both mesh axes > 1: the ring runs over the flattened axis pair."""
        rng = np.random.default_rng(2)
        q, k, v = _rand_qkv(rng, 1, 8 * 11, 3, 8)
        mesh = make_mesh(data=4, model=2)
        scale = 1.0 / (8.0**0.5)
        got = seq_sharded_ring(q, k, v, scale, mesh)
        ref = _xla_attention(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_within_block_chunking(self):
        """Chunked KV streaming (chunk < S_local) merges identically."""
        rng = np.random.default_rng(3)
        q, k, v = _rand_qkv(rng, 1, 8 * 24, 2, 8)
        mesh = make_mesh(data=8, model=1)
        scale = 0.25
        got = seq_sharded_ring(q, k, v, scale, mesh, chunk=8)
        ref = _xla_attention(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_bf16_inputs(self):
        rng = np.random.default_rng(4)
        q, k, v = _rand_qkv(rng, 1, 8 * 16, 3, 16, jnp.bfloat16)
        mesh = make_mesh(data=8, model=1)
        scale = 0.25
        got = seq_sharded_ring(q, k, v, scale, mesh)
        assert got.dtype == jnp.bfloat16
        ref = _xla_attention(q, k, v, scale)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2,
        )

    def test_gradients_match_exact(self):
        """Reverse-mode through the ring (lax.scan body + ppermute transpose)
        matches grads of the exact einsum path — required for VGGT
        fine-tuning on meshes where attention routes to the ring."""
        rng = np.random.default_rng(6)
        q, k, v = _rand_qkv(rng, 1, 8 * 9, 3, 8)
        mesh = make_mesh(data=8, model=1)
        scale = 1.0 / (8.0**0.5)

        def loss_ring(q, k, v):
            return jnp.sum(jnp.sin(seq_sharded_ring(q, k, v, scale, mesh)))

        def loss_ref(q, k, v):
            return jnp.sum(jnp.sin(_xla_attention(q, k, v, scale)))

        got = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for g, r in zip(got, ref):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-4, atol=2e-5)

    def test_routing_falls_back_to_ring(self):
        """multi_head_attention: mesh set + heads not divisible -> ring path
        (must equal impl='xla'); heads divisible keeps the head-shard path
        (covered by tests/test_vggt.py::TestMeshReconstructor)."""
        rng = np.random.default_rng(5)
        q, k, v = _rand_qkv(rng, 1, 131, 3, 8)  # 3 heads % 8 devices != 0
        mesh = make_mesh(data=8, model=1)
        ref = multi_head_attention(q, k, v, impl="xla")
        with att.head_sharded_attention(mesh, min_seq=16):
            got = multi_head_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
