"""Selective scan + SS2D tests.

The chunked associative scan is validated against a direct sequential
recurrence (the hardware-independent oracle for the reference's CUDA
`selective_scan_cuda_core`, see SURVEY.md A.10).
"""

import jax
import jax.numpy as jnp
import numpy as np

from tamtr_tpu.nn.ssm import SS2D, VSSBlock, cross_merge, cross_scan, selective_scan_xla


def naive_scan(u, delta, A, B, C, D):
    """Sequential S6 recurrence in numpy (fp64)."""
    G, L, Din = u.shape
    N = A.shape[-1]
    y = np.zeros((G, L, Din))
    for g in range(G):
        h = np.zeros((Din, N))
        for t in range(L):
            a = np.exp(delta[g, t][:, None] * A[g])  # (Din, N)
            b = (delta[g, t] * u[g, t])[:, None] * B[g, t][None, :]  # (Din, N)
            h = a * h + b
            y[g, t] = h @ C[g, t] + D[g] * u[g, t]
    return y


def test_selective_scan_matches_naive(rng):
    G, L, Din, N = 2, 37, 5, 4  # odd L to exercise padding
    u = rng.standard_normal((G, L, Din)).astype(np.float32)
    delta = np.abs(rng.standard_normal((G, L, Din))).astype(np.float32) * 0.1
    A = -np.abs(rng.standard_normal((G, Din, N))).astype(np.float32)
    B = rng.standard_normal((G, L, N)).astype(np.float32)
    C = rng.standard_normal((G, L, N)).astype(np.float32)
    D = rng.standard_normal((G, Din)).astype(np.float32)

    got = np.asarray(selective_scan_xla(*map(jnp.asarray, (u, delta, A, B, C, D)), chunk=8))
    want = naive_scan(u, delta, A, B, C, D)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_selective_scan_grad_finite(rng):
    G, L, Din, N = 1, 16, 4, 3
    u = jnp.asarray(rng.standard_normal((G, L, Din)).astype(np.float32))
    delta = jnp.asarray(np.abs(rng.standard_normal((G, L, Din))).astype(np.float32) * 0.1)
    A = jnp.asarray(-np.abs(rng.standard_normal((G, Din, N))).astype(np.float32))
    B = jnp.asarray(rng.standard_normal((G, L, N)).astype(np.float32))
    C = jnp.asarray(rng.standard_normal((G, L, N)).astype(np.float32))
    D = jnp.asarray(rng.standard_normal((G, Din)).astype(np.float32))

    def f(u, delta, A, B, C, D):
        return selective_scan_xla(u, delta, A, B, C, D, chunk=4).sum()

    grads = jax.grad(f, argnums=(0, 1, 2, 3, 4, 5))(u, delta, A, B, C, D)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))


def test_cross_scan_merge_inverse(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 3)).astype(np.float32))
    xs = cross_scan(x)
    assert xs.shape == (2, 4, 24, 3)
    # merging the raw scans sums each position exactly 4 times
    merged = cross_merge(xs, 4, 6)
    np.testing.assert_allclose(
        np.asarray(merged), np.asarray(x.reshape(2, 24, 3)) * 4.0, atol=1e-5
    )


def test_ss2d_shapes(rng):
    m = SS2D(d_model=16, scan_chunk=16)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))


def test_vssblock_shapes(rng):
    m = VSSBlock(hidden_dim=16, drop_path=0.1, scan_chunk=16)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape
    # train mode with drop-path rng
    y2 = m.apply(params, x, True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert y2.shape == x.shape
