"""Pallas selective-scan kernel vs the XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from tamtr_tpu.kernels.selective_scan import selective_scan_pallas
from tamtr_tpu.nn.ssm import selective_scan_xla


def _args(rng, G, L, Din, N):
    return (
        jnp.asarray(rng.standard_normal((G, L, Din)).astype(np.float32)),
        jnp.asarray((np.abs(rng.standard_normal((G, L, Din))) * 0.1).astype(np.float32)),
        jnp.asarray((-np.abs(rng.standard_normal((G, Din, N)))).astype(np.float32)),
        jnp.asarray(rng.standard_normal((G, L, N)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((G, L, N)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((G, Din)).astype(np.float32)),
    )


def test_pallas_matches_xla(rng):
    a = _args(rng, 2, 100, 8, 4)  # odd L exercises padding
    got = np.asarray(selective_scan_pallas(*a, 64))
    want = np.asarray(selective_scan_xla(*a, chunk=16))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_pallas_d_blocking(rng):
    a = _args(rng, 2, 70, 256, 4)  # D > Dblk=128 exercises the D grid axis
    got = np.asarray(selective_scan_pallas(*a, 32))
    want = np.asarray(selective_scan_xla(*a, chunk=32))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_pallas_grad(rng):
    a = _args(rng, 1, 40, 8, 4)

    def f_p(*args):
        return selective_scan_pallas(*args, 16).sum()

    def f_x(*args):
        return selective_scan_xla(*args, chunk=16).sum()

    gp = jax.grad(f_p, argnums=(0, 1, 2, 3, 4, 5))(*a)
    gx = jax.grad(f_x, argnums=(0, 1, 2, 3, 4, 5))(*a)
    for p, x in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(p), np.asarray(x), atol=1e-4, rtol=1e-4)
