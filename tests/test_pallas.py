"""Pallas jet-product kernel: correctness vs the XLA jet algebra.

Runs in interpret-compatible mode on the CPU test backend; the same kernel
compiles for real on TPU (exercised by bench/manual runs).
"""

import numpy as np
import pytest

from pde_engine_tpu.ops.jets import jet_mul, n_coeffs


@pytest.mark.parametrize("order,n_points", [(2, 6), (4, 8)])
def test_jet_mul_pallas_matches_xla(order, n_points):
    import jax.numpy as jnp
    from pde_engine_tpu.ops.pallas_kernels import jet_mul_pallas

    rng = np.random.default_rng(0)
    N, T = 130, n_coeffs(order)
    a = rng.normal(size=(N, n_points, T)).astype(np.float32)
    b = rng.normal(size=(N, n_points, T)).astype(np.float32)

    want = jet_mul(a, b, order, np)
    got = np.asarray(jet_mul_pallas(jnp.asarray(a), jnp.asarray(b),
                                    order, n_points))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-6)
