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

    def test_out_dtype_and_single_pass_tiles(self, rng):
        """New autotune surface: bf16 output + kv_tile >= S (single-pass
        softmax, no online rescaling) must match the tiled f32 baseline."""
        from diffreg_tpu.ops.pallas.attention_kernel import masked_attention_pallas

        b, h, l, s, d = 2, 2, 24, 40, 16
        q = jnp.asarray(rng.randn(b, h, l, d).astype(np.float32))
        k = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
        v = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
        m = jnp.asarray(rng.rand(b, s) > 0.3)
        ref = masked_attention_pallas(q, k, v, m, 8, 8, True)
        # kv_tile far beyond S: clamped to the lane-rounded key count
        one_pass = masked_attention_pallas(q, k, v, m, 8, 4096, True)
        np.testing.assert_allclose(np.asarray(one_pass), np.asarray(ref),
                                   atol=2e-5)
        bf16 = masked_attention_pallas(q, k, v, m, 8, 8, True,
                                       out_dtype=jnp.bfloat16)
        assert bf16.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(bf16, dtype=np.float32),
                                   np.asarray(ref), atol=0.02)

    def test_gradients_with_bf16_out(self, rng):
        from diffreg_tpu.ops.pallas.attention_kernel import masked_attention_pallas

        b, h, l, s, d = 1, 1, 16, 16, 8
        q = jnp.asarray(rng.randn(b, h, l, d).astype(np.float32))
        k = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
        v = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
        m = jnp.asarray(rng.rand(b, s) > 0.3)

        def f(q, k, v):
            o = masked_attention_pallas(q, k, v, m, 16, 16, True,
                                        out_dtype=jnp.bfloat16)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        assert all(x.dtype == jnp.float32 for x in g)
        assert all(np.isfinite(np.asarray(x)).all() for x in g)

    def test_layer_flash_matches_xla(self, rng):
        """GeometryAttentionLayer wiring of the tunable flash options: the
        flash layer (custom tiles, bf16 out) matches the XLA layer on valid
        rows. Interpret mode on CPU."""
        from diffreg_tpu.nn.transformer import GeometryAttentionLayer

        b, n, c, h = 2, 24, 32, 2
        x = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
        src = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
        x_mask = jnp.asarray(rng.rand(b, n) > 0.2)
        s_mask = jnp.asarray(rng.rand(b, n) > 0.2)

        def run(**kw):
            layer = GeometryAttentionLayer(c, h, "rotary", **kw)
            vs = layer.init(jax.random.PRNGKey(0), x, src, None, None,
                            x_mask, s_mask)
            return layer.apply(vs, x, src, None, None, x_mask, s_mask)

        ref = run(use_flash=False)
        got = run(use_flash=True, flash_q_tile=16, flash_kv_tile=4096,
                  flash_out_f32=False)
        valid = np.asarray(x_mask)
        np.testing.assert_allclose(np.asarray(got)[valid],
                                   np.asarray(ref)[valid], atol=2e-2)
