"""Weighted-gather with a Pallas scatter-accumulate backward.

The deformable-attention sampling gather (reference
`nn/modules/utils.py:42-92`, `F.grid_sample`) transposes to a scatter-add
in the backward: dL/dvalue[idx] += w * dL/dout. XLA lowers that scatter
serially, and in the full train-step program it also picks a transposed
({0,1}) layout for the level-0 target so every 64-wide update row touches
64 strided tiles — profiled at 67 ms per decoder layer (201 ms/step, 30%
of the whole b4 train step). This module routes the scatter through a
Pallas kernel with the (L, c) accumulator resident in VMEM: measured
8.5 ms for the same level-0 shape (G=32, 358k row-updates), 8x faster.

`weighted_gather(value, idx, w, p4)` is the custom_vjp op used by
`nn/decoder.py:ms_deform_attn_core`:
  out[b, q, n, :] = sum_k w[b, q*p4+k, n] * value[b, idx[b, q*p4+k, n], n, :]
The forward stays plain XLA (gathers are fast); only dvalue goes through
the kernel. dw is recomputed by re-gather; idx (int) gets no gradient —
sampling-location gradients flow through the bilinear corner weights
folded into `w`, exactly like grid_sample's backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tamtr_tpu.kernels.selective_scan import _compiler_params, _interpret

# Tests set this to force the Pallas backward (interpret mode) off-TPU.
FORCE_PALLAS = False


def _scatter_kernel(idx_ref, w_ref, dout_ref, acc_ref, *, n_upd: int, p4: int):
    """One grid step g (= b*nh + h). idx/w (1, n_upd) SMEM scalars;
    dout (Q, c) VMEM; acc out (L, c) VMEM."""
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(u, _):
        i = idx_ref[0, u]
        q = u // p4
        acc_ref[pl.ds(i, 1), :] += dout_ref[pl.ds(q, 1), :] * w_ref[0, u]
        return 0

    jax.lax.fori_loop(0, n_upd, body, 0)


def _scatter_acc(idx: jnp.ndarray, w: jnp.ndarray, dout: jnp.ndarray, L: int) -> jnp.ndarray:
    """idx (G, nU) int32 in [0, L); w (G, nU) f32; dout (G, Q, c) f32
    -> (G, L, c) f32 with rows accumulated at idx."""
    G, nU = idx.shape
    _, Q, c = dout.shape
    return pl.pallas_call(
        functools.partial(_scatter_kernel, n_upd=nU, p4=nU // Q),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((None, 1, nU), lambda g: (g, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, nU), lambda g: (g, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((None, Q, c), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, L, c), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, L, c), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(idx[:, None], w[:, None], dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def weighted_gather(value, idx, w, p4: int):
    """value (B, L, nh, c); idx (B, nU, nh) int32; w (B, nU, nh) f32,
    nU = Q * p4 -> (B, Q, nh, c) in value.dtype."""
    return _gather_fwd_impl(value, idx, w, p4)


def _gather_fwd_impl(value, idx, w, p4):
    B, _, nh, c = value.shape
    nU = idx.shape[1]
    g = jnp.take_along_axis(value, idx[..., None], axis=1)  # (B, nU, nh, c)
    g = g.reshape(B, nU // p4, p4, nh, c)
    wq = w.reshape(B, nU // p4, p4, nh)
    return jnp.einsum("bqpnc,bqpn->bqnc", g, wq.astype(g.dtype))


def _fwd(value, idx, w, p4):
    return _gather_fwd_impl(value, idx, w, p4), (value, idx, w)


def _bwd(p4, res, dout):
    value, idx, w = res
    B, L, nh, c = value.shape
    nU = idx.shape[1]
    Q = nU // p4
    dout32 = dout.astype(jnp.float32)
    if jax.default_backend() == "tpu" or FORCE_PALLAS:
        idx_g = idx.transpose(0, 2, 1).reshape(B * nh, nU)
        w_g = w.astype(jnp.float32).transpose(0, 2, 1).reshape(B * nh, nU)
        dout_g = dout32.transpose(0, 2, 1, 3).reshape(B * nh, Q, c)
        dv = _scatter_acc(idx_g, w_g, dout_g, L)
        dv = dv.reshape(B, nh, L, c).transpose(0, 2, 1, 3)
    else:
        upd = w[..., None].astype(jnp.float32) * jnp.broadcast_to(
            dout32[:, :, None], (B, Q, p4, nh, c)
        ).reshape(B, nU, nh, c)
        dv = (
            jnp.zeros((B, L, nh, c), jnp.float32)
            .at[jnp.arange(B)[:, None, None], idx, jnp.arange(nh)[None, None, :]]
            .add(upd)
        )
    g = jnp.take_along_axis(value, idx[..., None], axis=1).astype(jnp.float32)
    dw = jnp.einsum(
        "bqpnc,bqnc->bqpn", g.reshape(B, Q, p4, nh, c), dout32
    ).reshape(B, nU, nh)
    return dv.astype(value.dtype), None, dw.astype(w.dtype)


weighted_gather.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Bilinear-structured variant: pair-blocked scatter.
#
# The 4 bilinear corners of one sample point form a 2x2 pixel block; the two
# corners in each row are CONSECUTIVE flat indices. Scattering (2, c) row
# pairs instead of single (1, c) rows halves the sequential update count
# (the kernel is loop-bound: ~13.6 ns/update regardless of L). Out-of-range
# corners carry zero weight, so they may land anywhere in-bounds: pair
# starts are clamped to column [0, W-1] (an x0=-1 pair shifts to column 0
# with its weights swapped — both of its corners clip to column 0 anyway,
# so the forward is unchanged), and the accumulator gets _ROW_PAD spare
# rows so the (H-1, W-1) pair's second row lands in scratch instead of out
# of bounds. The spare rows are cut by a contiguous (fusable) slice — an
# earlier halo-padded (H+2, W+2) layout spent ~4 ms/call on the strided
# interior copy, more than the kernel saved. Raw kernel at the production
# level-0 shape (G=32, 9600 pairs): 3.7 -> 2.8 ms vs row-at-a-time; full
# 640px b4 train step 448 -> 425 ms.
# ---------------------------------------------------------------------------

_ROW_PAD = 8  # spare accumulator rows; >= 1 needed, 8 keeps fp32 tiling


def _scatter_pairs_kernel(
    idx_ref, wa_ref, wb_ref, dout_ref, acc_ref, *, n_upd: int, per_q: int
):
    """One grid step g. idx/wa/wb (1, nU2) SMEM scalars (the two pair
    weights ride separate arrays: a trailing (..., 2) SMEM dim is padded
    ~128x by the compiler and blows the scalar-memory budget); dout (Q, c)
    VMEM; acc out (L2, c) VMEM. Update u adds (wa, wb) (x) dout[u // per_q]
    at rows [idx[u], idx[u]+1]."""
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(u, _):
        i = idx_ref[0, u]
        row = dout_ref[pl.ds(u // per_q, 1), :]  # (1, c)
        upd = jnp.concatenate([row * wa_ref[0, u], row * wb_ref[0, u]], axis=0)
        acc_ref[pl.ds(i, 2), :] += upd
        return 0

    jax.lax.fori_loop(0, n_upd, body, 0)


def _scatter_acc_pairs(idx2, wa, wb, dout, L2: int) -> jnp.ndarray:
    """idx2 (G, nU2) int32 pair starts in [0, L2-1); wa/wb (G, nU2) f32
    weights for rows idx2/idx2+1; dout (G, Q, c) f32 -> (G, L2, c) f32."""
    G, nU2 = idx2.shape
    _, Q, c = dout.shape
    smem = pl.BlockSpec((None, 1, nU2), lambda g: (g, 0, 0), memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_scatter_pairs_kernel, n_upd=nU2, per_q=nU2 // Q),
        grid=(G,),
        in_specs=[
            smem,
            smem,
            smem,
            pl.BlockSpec((None, Q, c), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, L2, c), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, L2, c), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(idx2[:, None], wa[:, None], wb[:, None], dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def bilinear_gather(value, idx4, w_pairs, idx2, P: int):
    """Bilinear deformable-sampling gather with pair-blocked scatter backward.

    value: (B, H*W, nh, c) one level's features.
    idx4: (B, Q*P*4, nh) int32 clipped flat corner indices, corner order
      (y0,x0),(y0,x1),(y1,x0),(y1,x1) fastest (grid_sample zeros-pad
      semantics: out-of-range corners carry zero weight in `w_pairs`).
    w_pairs: (B, Q*P*2, nh, 2) f32 corner weights (x attention weight), one
      (2,)-pair per 2x2-block row; differentiable (location grads flow
      here). When x0 < 0 the pair must be pre-swapped to (w_x1, 0) by the
      caller (see `ms_deform_attn_core`) so the valid corner rides slot 0.
    idx2: (B, Q*P*2, nh) int32 pair starts clip(y,0,H-1)*W + clip(x0,0,W-1);
      rows idx2 and idx2+1 receive the two pair weights (idx2+1 may reach
      row H*W for the bottom-right pixel — it lands in the accumulator's
      spare rows with weight 0).
    Returns (B, Q, nh, c) in value.dtype.
    """
    return _bilinear_fwd_impl(value, idx4, w_pairs, P)


def _w4_of_pairs(w_pairs):
    B, nU2, nh, _ = w_pairs.shape
    return w_pairs.transpose(0, 1, 3, 2).reshape(B, nU2 * 2, nh)


def _bilinear_fwd_impl(value, idx4, w_pairs, P):
    return _gather_fwd_impl(value, idx4, _w4_of_pairs(w_pairs), P * 4)


def _bilinear_fwd(value, idx4, w_pairs, idx2, P):
    return _bilinear_fwd_impl(value, idx4, w_pairs, P), (value, idx4, w_pairs, idx2)


def _bilinear_bwd(P, res, dout):
    value, idx4, w_pairs, idx2 = res
    B, L, nh, c = value.shape
    nU4 = idx4.shape[1]
    Q = nU4 // (P * 4)
    dout32 = dout.astype(jnp.float32)
    if jax.default_backend() == "tpu" or FORCE_PALLAS:
        idx_g = idx2.transpose(0, 2, 1).reshape(B * nh, nU4 // 2)
        # (B, nU2, nh, 2) -> (2, B*nh, nU2): contiguous per-slot weight
        # planes (a trailing stride-2 slice feeding SMEM costs a copy)
        w_g = w_pairs.astype(jnp.float32).transpose(3, 0, 2, 1).reshape(
            2, B * nh, nU4 // 2
        )
        dout_g = dout32.transpose(0, 2, 1, 3).reshape(B * nh, Q, c)
        dv = _scatter_acc_pairs(idx_g, w_g[0], w_g[1], dout_g, L + _ROW_PAD)[:, :L]
        dv = dv.reshape(B, nh, L, c).transpose(0, 2, 1, 3)
    else:
        w4 = _w4_of_pairs(w_pairs)
        upd = w4[..., None].astype(jnp.float32) * jnp.broadcast_to(
            dout32[:, :, None], (B, Q, P * 4, nh, c)
        ).reshape(B, nU4, nh, c)
        dv = (
            jnp.zeros((B, L, nh, c), jnp.float32)
            .at[jnp.arange(B)[:, None, None], idx4, jnp.arange(nh)[None, None, :]]
            .add(upd)
        )
    g = jnp.take_along_axis(value, idx4[..., None], axis=1).astype(jnp.float32)
    dw4 = jnp.einsum(
        "bqpnc,bqnc->bqpn", g.reshape(B, Q, P * 4, nh, c), dout32
    ).reshape(B, nU4 // 2, 2, nh)
    dw_pairs = dw4.transpose(0, 1, 3, 2).astype(w_pairs.dtype)
    return dv.astype(value.dtype), None, dw_pairs, None


bilinear_gather.defvjp(_bilinear_fwd, _bilinear_bwd)
