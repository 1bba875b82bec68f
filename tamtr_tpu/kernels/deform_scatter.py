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
