"""Sequence-parallel selective scan vs the single-device oracle.

Capability extension beyond the reference (SURVEY §5.7): the token axis
shards over the mesh; a two-phase blocked scan exchanges (G, Din, N) block
summaries over the axis. Exactness: the recurrence is associative, so the
sharded result must match the sequential scan to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tamtr_tpu.nn.ssm import selective_scan_xla
from tamtr_tpu.parallel.mesh import DATA_AXIS, make_mesh
from tamtr_tpu.parallel.seq_scan import selective_scan_sp


def _args(rng, G, L, Din, N):
    return (
        jnp.asarray(rng.standard_normal((G, L, Din)).astype(np.float32)),
        jnp.asarray((np.abs(rng.standard_normal((G, L, Din))) * 0.1).astype(np.float32)),
        jnp.asarray((-np.abs(rng.standard_normal((G, Din, N)))).astype(np.float32)),
        jnp.asarray(rng.standard_normal((G, L, N)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((G, L, N)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((G, Din)).astype(np.float32)),
    )


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_seq_parallel_matches_sequential():
    rng = np.random.default_rng(0)
    mesh = make_mesh(8)
    u, dt, A, Bs, Cs, D = _args(rng, 2, 512, 8, 4)  # 64 tokens per device
    want = np.asarray(selective_scan_xla(u, dt, A, Bs, Cs, D, chunk=32))
    got = np.asarray(
        jax.jit(
            lambda *a: selective_scan_sp(*a, mesh=mesh, axis=DATA_AXIS, chunk=32)
        )(u, dt, A, Bs, Cs, D)
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_seq_parallel_no_dskip_and_uneven_chunk():
    rng = np.random.default_rng(1)
    mesh = make_mesh(8)
    u, dt, A, Bs, Cs, _ = _args(rng, 1, 8 * 37, 8, 4)  # 37 tokens/device: pads
    want = np.asarray(selective_scan_xla(u, dt, A, Bs, Cs, None, chunk=16))
    got = np.asarray(
        jax.jit(
            lambda *a: selective_scan_sp(*a, None, mesh=mesh, chunk=16)
        )(u, dt, A, Bs, Cs)
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_seq_parallel_grad_matches():
    """shard_map + collectives are differentiable: gradients through the
    sharded scan equal the sequential scan's."""
    rng = np.random.default_rng(2)
    mesh = make_mesh(8)
    u, dt, A, Bs, Cs, D = _args(rng, 1, 128, 4, 4)
    w = jnp.asarray(rng.standard_normal((4,)).astype(np.float32))

    def loss_seq(u, dt, Bs):
        return (selective_scan_xla(u, dt, A, Bs, Cs, D, chunk=16) * w).sum()

    def loss_sp(u, dt, Bs):
        return (selective_scan_sp(u, dt, A, Bs, Cs, D, mesh=mesh, chunk=16) * w).sum()

    g_seq = jax.grad(loss_seq, argnums=(0, 1, 2))(u, dt, Bs)
    g_sp = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(u, dt, Bs)
    for a, b in zip(g_sp, g_seq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4)
