"""Pallas kernel parity tests (interpret mode on CPU; compiled on TPU runs)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest



class TestPallasFlashAttention:
    def test_matches_xla_forward(self, rng):
        from diffreg_tpu.ops.pallas.attention_kernel import masked_attention_pallas

        b, h, l, s, d = 2, 2, 24, 40, 16
        q = jnp.asarray(rng.randn(b, h, l, d).astype(np.float32))
        k = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
        v = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
        m = jnp.asarray(rng.rand(b, s) > 0.3)
        logits = jnp.einsum("bhld,bhsd->bhls", q, k) / np.sqrt(d)
        logits = jnp.where(m[:, None, None, :], logits, -1e9)
        ref = jnp.einsum("bhls,bhsd->bhld", jax.nn.softmax(logits, -1), v)
        got = masked_attention_pallas(q, k, v, m, 8, 8, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_gradients_match(self, rng):
        from diffreg_tpu.ops.pallas.attention_kernel import masked_attention_pallas

        b, h, l, s, d = 1, 1, 16, 16, 8
        q = jnp.asarray(rng.randn(b, h, l, d).astype(np.float32))
        k = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
        v = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
        m = jnp.asarray(rng.rand(b, s) > 0.3)

        def f(q, k, v):
            return jnp.sum(masked_attention_pallas(q, k, v, m, 16, 16, True) ** 2)

        def ref(q, k, v):
            logits = jnp.einsum("bhld,bhsd->bhls", q, k) / np.sqrt(d)
            logits = jnp.where(m[:, None, None, :], logits, -1e9)
            o = jnp.einsum("bhls,bhsd->bhld", jax.nn.softmax(logits, -1), v)
            return jnp.sum(o ** 2)

        g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
