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


def _bilinear_parts(value, loc, w_att, H, W):
    """Differentiable replica of ms_deform_attn_core's index/weight
    construction (single level), border-straddling points included."""
    B, Q, nh, P, _ = loc.shape
    x = loc[..., 0] * W - 0.5
    y = loc[..., 1] * H - 0.5
    x0, y0 = jnp.floor(x), jnp.floor(y)
    wx1, wy1 = x - x0, y - y0
    corners = []
    for dy, wy in ((0, 1.0 - wy1), (1, wy1)):
        for dx, wx in ((0, 1.0 - wx1), (1, wx1)):
            xi, yi = x0 + dx, y0 + dy
            valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            idx = (
                jnp.clip(yi, 0, H - 1).astype(jnp.int32) * W
                + jnp.clip(xi, 0, W - 1).astype(jnp.int32)
            )
            corners.append((idx, (wx * wy) * valid))
    idx_all = jnp.stack([ci for ci, _ in corners], axis=-1)
    w_all = jnp.stack([cw for _, cw in corners], axis=-1)
    idx4 = idx_all.transpose(0, 1, 3, 4, 2).reshape(B, Q * P * 4, nh)
    w4 = (w_all * w_att[..., None]).transpose(0, 1, 3, 4, 2)
    w_pairs = w4.reshape(B, Q * P * 2, 2, nh).transpose(0, 1, 3, 2)
    xs = jnp.clip(x0, 0, W - 1).astype(jnp.int32)
    r0 = jnp.clip(y0, 0, H - 1).astype(jnp.int32) * W + xs
    r1 = jnp.clip(y0 + 1, 0, H - 1).astype(jnp.int32) * W + xs
    idx2 = jnp.stack([r0, r1], axis=-1)
    idx2 = idx2.transpose(0, 1, 3, 4, 2).reshape(B, Q * P * 2, nh)
    swap = jnp.broadcast_to((x0 < 0)[..., None], x0.shape + (2,))
    swap = swap.transpose(0, 1, 3, 4, 2).reshape(B, Q * P * 2, nh)
    w_pairs = jnp.where(swap[..., None], w_pairs[..., ::-1], w_pairs)
    return idx4, w_pairs, idx2


def _make_bilinear(B=2, H=9, W=11, nh=2, c=8, Q=5, P=3, seed=3):
    """Inputs with sample locations straddling the borders (negative, > size)."""
    rng = np.random.default_rng(seed)
    value = jnp.asarray(rng.standard_normal((B, H * W, nh, c)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, (B, Q, nh, P, 2)), jnp.float32)
    w_att = jnp.asarray(rng.random((B, Q, nh, P)), jnp.float32)
    return value, loc, w_att, H, W, P


@pytest.mark.parametrize("force_pallas", [False, True])
def test_bilinear_forward_matches_weighted_gather(force_pallas, monkeypatch):
    """Pallas pair-gather forward (interpret mode on CPU) == plain XLA
    4-corner gather, including clipped border pairs and the bottom-right
    pair that reads the zero-padded spare row."""
    from tamtr_tpu.kernels.deform_scatter import bilinear_gather, _w4_of_pairs

    monkeypatch.setattr(ds, "FORCE_PALLAS", force_pallas)
    value, loc, w_att, H, W, P = _make_bilinear()
    idx4, w_pairs, idx2 = _bilinear_parts(value, loc, w_att, H, W)
    out = bilinear_gather(value, idx4, w_pairs, idx2, P)
    ref = weighted_gather(value, idx4, _w4_of_pairs(w_pairs), P * 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("force_pallas", [False, True])
def test_bilinear_backward_matches_autodiff(force_pallas, monkeypatch):
    """Fused Pallas backward (pair scatter + dw dots) == XLA autodiff of the
    plain 4-corner gather, differentiated through the full location->weight
    construction (for border-clipped dead slots the raw dw value is
    unspecified — it is killed by the valid=0 factor upstream, so the
    comparison must include that chain)."""
    from tamtr_tpu.kernels.deform_scatter import bilinear_gather, _w4_of_pairs

    monkeypatch.setattr(ds, "FORCE_PALLAS", force_pallas)
    value, loc, w_att, H, W, P = _make_bilinear(seed=4)

    def loss_custom(v, l, wa):
        idx4, w_pairs, idx2 = _bilinear_parts(v, l, wa, H, W)
        out = bilinear_gather(v, idx4, w_pairs, idx2, P)
        return jnp.sum(jnp.sin(out) * jnp.cos(out * 0.5))

    def loss_ref(v, l, wa):
        idx4, w_pairs, _ = _bilinear_parts(v, l, wa, H, W)
        out = _gather_fwd_impl(v, idx4, _w4_of_pairs(w_pairs), P * 4)
        return jnp.sum(jnp.sin(out) * jnp.cos(out * 0.5))

    gv, gl, ga = jax.grad(loss_custom, argnums=(0, 1, 2))(value, loc, w_att)
    rv, rl, ra = jax.grad(loss_ref, argnums=(0, 1, 2))(value, loc, w_att)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(rl), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), rtol=1e-5, atol=1e-5)


def test_bilinear_bf16_value_pallas(monkeypatch):
    """bf16 value through the Pallas pair kernels: the padded copy and the
    dvalue result stay bf16 (HBM halving), accumulation runs in f32 scratch
    — outputs/grads must match the fp32 path to bf16 rounding."""
    from tamtr_tpu.kernels.deform_scatter import bilinear_gather

    monkeypatch.setattr(ds, "FORCE_PALLAS", True)
    value, loc, w_att, H, W, P = _make_bilinear(seed=5)
    v16 = value.astype(jnp.bfloat16)

    def loss(v):
        idx4, w_pairs, idx2 = _bilinear_parts(v.astype(jnp.float32), loc, w_att, H, W)
        out = bilinear_gather(v, idx4, w_pairs, idx2, P)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    out16 = bilinear_gather(v16, *_bilinear_parts(value, loc, w_att, H, W), P)
    assert out16.dtype == jnp.bfloat16
    ref = bilinear_gather(value, *_bilinear_parts(value, loc, w_att, H, W), P)
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2
    )
    g16 = jax.grad(loss)(v16)
    assert g16.dtype == jnp.bfloat16
    g32 = jax.grad(loss)(value)
    np.testing.assert_allclose(
        np.asarray(g16, np.float32), np.asarray(g32), rtol=3e-2, atol=3e-2
    )
