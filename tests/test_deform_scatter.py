"""weighted_gather custom_vjp vs plain-XLA autodiff (Pallas scatter in interpret mode).

The op implements the grid_sample-style gather used by ms_deform_attn_core
(reference `ultralytics/nn/modules/utils.py:42-92`); its backward routes
dL/dvalue through the Pallas scatter-accumulate kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tamtr_tpu.kernels.deform_scatter as ds
from tamtr_tpu.kernels.deform_scatter import _gather_fwd_impl, weighted_gather


def _make(B=2, L=60, nh=3, c=8, Q=7, p4=16, seed=0):
    rng = np.random.default_rng(seed)
    value = jnp.asarray(rng.standard_normal((B, L, nh, c)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, L, (B, Q * p4, nh)), jnp.int32)
    w = jnp.asarray(rng.standard_normal((B, Q * p4, nh)), jnp.float32)
    return value, idx, w, p4


def test_forward_matches_plain_gather():
    value, idx, w, p4 = _make()
    out = weighted_gather(value, idx, w, p4)
    ref = _gather_fwd_impl(value, idx, w, p4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("force_pallas", [False, True])
def test_backward_matches_autodiff(force_pallas, monkeypatch):
    """custom_vjp grads == XLA autodiff of the plain gather, on both the
    scatter-add fallback and the Pallas kernel (interpret mode on CPU)."""
    monkeypatch.setattr(ds, "FORCE_PALLAS", force_pallas)
    value, idx, w, p4 = _make(seed=1)

    def loss_custom(v, ww):
        out = weighted_gather(v, idx, ww, p4)
        return jnp.sum(jnp.sin(out) * jnp.cos(out * 0.5))

    def loss_ref(v, ww):
        out = _gather_fwd_impl(v, idx, ww, p4)
        return jnp.sum(jnp.sin(out) * jnp.cos(out * 0.5))

    gv, gw = jax.grad(loss_custom, argnums=(0, 1))(value, w)
    rv, rw = jax.grad(loss_ref, argnums=(0, 1))(value, w)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-5, atol=1e-5)


def test_backward_bf16_value_dtype(monkeypatch):
    """dvalue comes back in value.dtype (bf16 compute path)."""
    value, idx, w, p4 = _make(seed=2)
    value = value.astype(jnp.bfloat16)
    g = jax.grad(lambda v: jnp.sum(weighted_gather(v, idx, w, p4).astype(jnp.float32)))(value)
    assert g.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))


def test_repeated_indices_accumulate(monkeypatch):
    """Colliding indices must sum their contributions (the scatter is an add)."""
    monkeypatch.setattr(ds, "FORCE_PALLAS", True)
    B, L, nh, c, Q, p4 = 1, 4, 1, 8, 2, 4
    value = jnp.ones((B, L, nh, c), jnp.float32)
    idx = jnp.zeros((B, Q * p4, nh), jnp.int32)  # everything hits row 0
    w = jnp.ones((B, Q * p4, nh), jnp.float32)
    g = jax.grad(lambda v: jnp.sum(weighted_gather(v, idx, w, p4)))(value)
    np.testing.assert_allclose(np.asarray(g[0, 0, 0]), np.full(c, Q * p4, np.float32))
    np.testing.assert_allclose(np.asarray(g[0, 1:, 0]), np.zeros((L - 1, c), np.float32))
