"""Pallas auction kernel vs the XLA auction and the scipy oracle."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tamtr_tpu.kernels.auction import auction_match_pallas
from tamtr_tpu.losses.matcher import _solve_host, auction_match


def _total(cost, a):
    t = 0.0
    for b in range(cost.shape[0]):
        sel = a[b] >= 0
        t += float(cost[b][a[b][sel], np.where(sel)[0]].sum())
    return t


@pytest.mark.parametrize(
    "B,nq,M,nv",
    [(4, 50, 30, 20), (2, 100, 300, 40), (2, 100, 300, 95), (2, 20, 20, 20)],
)
def test_pallas_matches_xla_auction(B, nq, M, nv):
    rng = np.random.default_rng(B * 1000 + nv)
    cost = jnp.asarray(rng.normal(size=(B, nq, M)).astype(np.float32))
    mask = jnp.asarray(np.arange(M)[None] < nv).astype(bool).repeat(B, 0)
    a_x = np.asarray(auction_match(cost, mask))
    a_p = np.asarray(auction_match_pallas(cost, mask))
    assert (a_x == a_p).all(), "kernel must reproduce the XLA auction exactly"


def test_pallas_near_optimal_production_shape():
    """<=1% of optimal at the TAM-TR production shape (nq=100, M=300)."""
    rng = np.random.default_rng(7)
    B, nq, M, nv = 4, 100, 300, 80
    cost = jnp.asarray(rng.normal(size=(B, nq, M)).astype(np.float32) * 3.0)
    mask = jnp.asarray(np.arange(M)[None] < nv).astype(bool).repeat(B, 0)
    a_p = np.asarray(auction_match_pallas(cost, mask))
    opt = _solve_host(np.asarray(cost), np.asarray(mask.sum(1)))
    c = np.asarray(cost)
    t_p, t_o = _total(c, a_p), _total(c, opt)
    assert (a_p >= 0).sum() == (opt >= 0).sum()
    assert t_p <= t_o + 0.01 * abs(t_o)
