"""Pallas kernel parity tests (interpret mode on CPU; compiled on TPU runs)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffreg_tpu.ops.pallas.sinkhorn_kernel import log_sinkhorn_pallas
from diffreg_tpu.ops.sinkhorn import log_sinkhorn


class TestPallasSinkhorn:
    def test_matches_xla_masked(self, rng):
        b, n, m = 3, 24, 20
        scores = jnp.asarray(rng.randn(b, n, m).astype(np.float32))
        sm = jnp.asarray(rng.rand(b, n) > 0.25)
        tm = jnp.asarray(rng.rand(b, m) > 0.25)
        ref = np.asarray(log_sinkhorn(scores, 0.7, 3, sm, tm))
        got = np.asarray(log_sinkhorn_pallas(scores, 0.7, 3, sm, tm, interpret=True))
        fin = ref > -1e8
        np.testing.assert_allclose(got[fin], ref[fin], atol=1e-4)

    def test_conf_matrix_rowsums(self, rng):
        b, n, m = 1, 16, 16
        scores = jnp.asarray(rng.randn(b, n, m).astype(np.float32))
        sm = jnp.ones((b, n), bool)
        tm = jnp.ones((b, m), bool)
        z = log_sinkhorn_pallas(scores, 1.0, 30, sm, tm, interpret=True)
        p = np.exp(np.asarray(z))
        np.testing.assert_allclose(p[:, :-1, :].sum(-1), 1.0, atol=1e-3)
