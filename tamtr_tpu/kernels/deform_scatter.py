"""Weighted-gather with Pallas forward-gather and scatter-accumulate backward.

The deformable-attention sampling gather (reference
`nn/modules/utils.py:42-92`, `F.grid_sample`) is slow in BOTH directions
under plain XLA at production shapes:

- backward: dL/dvalue[idx] += w * dL/dout lowers to a serial scatter that
  also picks a transposed ({0,1}) layout for the level-0 target — profiled
  at 67 ms per decoder layer (201 ms/step, 30% of the whole b4 train step).
  Routed through a Pallas kernel with the (L, c) accumulator resident in
  VMEM: 8.5 ms for the same level-0 shape (G=32, 358k row-updates).
- forward: XLA's row gather runs at ~17 ns/row regardless of row width
  below 256 lanes (row-count bound: c=64 37.7 ms, c=128 21.8, c=256 15.7;
  a 4-wide "quad" re-layout costs 10.5 ms to materialize, a wash). Routed
  through `_gather_acc_pairs`: the (L, c) value block stays VMEM-resident
  per (batch, head) grid step and each bilinear corner PAIR is one (2, c)
  dynamic row load (the two x corners of a sample point are consecutive
  flat indices), accumulated per query in registers and stored once.

Same-session A/B at 640px b8 Q=700 fp32 (TAMTR_DEFORM_XLA=1 vs Pallas,
`tools/bench_deform.py`): fwd 38.1 -> 19.1 ms/decoder-layer (2.0x),
fwd+bwd 182.3 -> 37.1 ms (4.9x).

`bilinear_gather(value, idx4, w_pairs, idx2, P)` is the custom_vjp op used
by `nn/decoder.py:ms_deform_attn_core`. On TPU the forward runs the Pallas
pair-gather and the backward one fused Pallas pass producing both dvalue
(pair scatter-accumulate) and dw (per-pair value·dout dots); off-TPU both
fall back to plain XLA. idx (int) gets no gradient — sampling-location
gradients flow through the bilinear corner weights folded into `w`,
exactly like grid_sample's backward.

Note the dw contract: for border-clipped pairs whose corner weight is
structurally zero (the `valid` factor in `ms_deform_attn_core` is 0), the
dead slot's dw value is unspecified — the Pallas path returns
value[idx2+slot]·dout while XLA returns value[idx4_clipped]·dout. Both are
multiplied by d(w)/d(upstream) = 0 in the caller's weight construction, so
end-to-end gradients are identical (asserted by tests through the full
location->weight chain).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tamtr_tpu.kernels.selective_scan import _compiler_params as _scan_params
from tamtr_tpu.kernels.selective_scan import _interpret

# Tests set this to force the Pallas backward (interpret mode) off-TPU.
FORCE_PALLAS = False

# The multi-level value block (33.6k rows at 640px) plus the backward's f32
# widen scratches exceeds the default 64 MB scoped-VMEM budget at batch 8
# (measured 82 MB); the v5e has 128 MB of VMEM, so grant these kernels a
# larger scoped budget instead of splitting the block back per level.
_DEFORM_VMEM = int(os.environ.get("TAMTR_DEFORM_VMEM", 112 * 1024 * 1024))


def _compiler_params():
    p = _scan_params()
    if p is not None and getattr(p, "vmem_limit_bytes", None) is not None:
        try:
            import dataclasses

            return dataclasses.replace(
                p, vmem_limit_bytes=max(p.vmem_limit_bytes, _DEFORM_VMEM)
            )
        except Exception:
            return p
    return p


def _use_pallas() -> bool:
    """Pallas on TPU (or when tests force it); TAMTR_DEFORM_XLA=1 opts back
    into the plain-XLA gather/scatter for A/B benchmarking."""
    if os.environ.get("TAMTR_DEFORM_XLA"):
        return False
    return jax.default_backend() == "tpu" or FORCE_PALLAS


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
    if _use_pallas():
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
# so the forward is unchanged). A pair starting on the GLOBAL last row (its
# second row would be out of bounds with structural weight 0) is shifted one
# row up with its weights swapped by `bilinear_gather` — the same trick on
# the other axis. r4 instead zero-padded the value block with _ROW_PAD spare
# rows; at the r5 multi-level shapes that pad was a full copy of the 33.6k-
# row value per decoder layer (0.82 ms/layer eval, bench_artifacts/r05) —
# the swap costs one elementwise pass over the small idx/weight arrays.
# An earlier halo-padded (H+2, W+2) layout spent ~4 ms/call on the strided
# interior copy, more than the kernel saved. Raw kernel at the production
# level-0 shape (G=32, 9600 pairs): 3.7 -> 2.8 ms vs row-at-a-time; full
# 640px b4 train step 448 -> 425 ms.
# ---------------------------------------------------------------------------


def _gather_pairs_kernel(
    idx_ref, wa_ref, wb_ref, value_ref, out_ref, *scratch, pairs_per_q: int
):
    """One grid step g (= b*nh + h). idx/wa/wb (1, nU2) SMEM; value (L, c)
    VMEM (pair indices pre-conditioned to [0, L-2] by `bilinear_gather`);
    out (Q, c) VMEM. Query q accumulates its
    pairs_per_q = P*2 corner pairs in registers and stores once.

    bf16 value blocks ride HBM half-width but Mosaic can't prove alignment
    for dynamic 2-row loads from a bf16 (16, 128)-tiled ref — so non-f32
    blocks are widened ONCE into an f32 VMEM scratch (one vectorized pass)
    and the dynamic row loads read the scratch."""
    if scratch:
        scratch[0][...] = value_ref[...].astype(jnp.float32)
        rows_ref = scratch[0]
    else:
        rows_ref = value_ref

    def body(q, _):
        acc = jnp.zeros((1, out_ref.shape[1]), jnp.float32)
        for j in range(pairs_per_q):  # static unroll
            u = q * pairs_per_q + j
            rows = rows_ref[pl.ds(idx_ref[0, u], 2), :]  # (2, c) f32
            acc = acc + rows[0:1] * wa_ref[0, u] + rows[1:2] * wb_ref[0, u]
        out_ref[pl.ds(q, 1), :] = acc
        return 0

    jax.lax.fori_loop(0, out_ref.shape[0], body, 0)


def _gather_pairs_kernel_q2(
    idx_ref, wa_ref, wb_ref, value_ref, out_ref, *scratch, pairs_per_q: int
):
    """2-query-interleaved variant of `_gather_pairs_kernel` (opt-in via
    TAMTR_DEFORM_Q2=1, requires Q even): each loop iteration accumulates
    TWO queries' pair lists, doubling the independent (2, c) loads/FMAs in
    flight so Mosaic can hide the dynamic-load latency."""
    if scratch:
        scratch[0][...] = value_ref[...].astype(jnp.float32)
        rows_ref = scratch[0]
    else:
        rows_ref = value_ref
    c = out_ref.shape[1]

    def body(q2, _):
        q = q2 * 2
        acc0 = jnp.zeros((1, c), jnp.float32)
        acc1 = jnp.zeros((1, c), jnp.float32)
        for j in range(pairs_per_q):  # static unroll
            u0 = q * pairs_per_q + j
            u1 = u0 + pairs_per_q
            r0 = rows_ref[pl.ds(idx_ref[0, u0], 2), :]
            r1 = rows_ref[pl.ds(idx_ref[0, u1], 2), :]
            acc0 = acc0 + r0[0:1] * wa_ref[0, u0] + r0[1:2] * wb_ref[0, u0]
            acc1 = acc1 + r1[0:1] * wa_ref[0, u1] + r1[1:2] * wb_ref[0, u1]
        out_ref[pl.ds(q, 1), :] = acc0
        out_ref[pl.ds(q + 1, 1), :] = acc1
        return 0

    jax.lax.fori_loop(0, out_ref.shape[0] // 2, body, 0)


def _gather_acc_pairs(idx2, wa, wb, value_pad, Q: int):
    """idx2/wa/wb (G, nU2) with idx2 in [0, L2-2]; value_pad (G, L2, c) any
    float dtype -> (G, Q, c) f32; nU2 = Q * pairs_per_q."""
    G, nU2 = idx2.shape
    _, L2, c = value_pad.shape
    smem = pl.BlockSpec((None, 1, nU2), lambda g: (g, 0, 0), memory_space=pltpu.SMEM)
    widen = value_pad.dtype != jnp.float32
    q2 = os.environ.get("TAMTR_DEFORM_Q2") == "1" and Q % 2 == 0
    kernel = _gather_pairs_kernel_q2 if q2 else _gather_pairs_kernel
    return pl.pallas_call(
        functools.partial(kernel, pairs_per_q=nU2 // Q),
        grid=(G,),
        in_specs=[
            smem,
            smem,
            smem,
            pl.BlockSpec((None, L2, c), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, Q, c), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, Q, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((L2, c), jnp.float32)] if widen else [],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(idx2[:, None], wa[:, None], wb[:, None], value_pad)


def _scatter_dw_pairs_kernel(
    idx_ref, wa_ref, wb_ref, value_ref, dout_ref, acc_ref, dw_ref,
    *scratch, pairs_per_q: int,
):
    """Fused backward: one grid step g. idx/wa/wb (1, nU2) SMEM; value
    (L2, c) and dout (Q, c) VMEM. Outputs: acc (L2, c) scatter-accumulated
    dvalue rows (value dtype — bf16 halves the HBM result), dw (nU2, 2)
    per-pair value·dout dots.

    f32 value: accumulate straight into acc_ref, no scratch (the two extra
    (L2, c) f32 scratches tipped the level-0 block past the 64 MB scoped
    VMEM cap at b4 f32). bf16 value: the block is widened ONCE into an f32
    scratch for the dynamic row loads (Mosaic can't prove alignment for
    2-row dynamic loads from a bf16-tiled ref) and accumulation runs in a
    second f32 scratch that rounds ONCE at the final store, so the bf16 acc
    equals the f32 result rounded. The dout row is loaded once per query
    and shared by its pairs_per_q updates."""
    if scratch:
        rows32_ref, acc32_ref = scratch
        rows32_ref[...] = value_ref[...].astype(jnp.float32)
        rows_ref = rows32_ref
    else:
        rows_ref = value_ref
        acc32_ref = acc_ref
    acc32_ref[...] = jnp.zeros_like(acc32_ref)

    def body(q, _):
        drow = dout_ref[pl.ds(q, 1), :]  # (1, c) f32
        for j in range(pairs_per_q):  # static unroll
            u = q * pairs_per_q + j
            i = idx_ref[0, u]
            rows = rows_ref[pl.ds(i, 2), :]  # (2, c) f32
            upd = jnp.concatenate([drow * wa_ref[0, u], drow * wb_ref[0, u]], axis=0)
            acc32_ref[pl.ds(i, 2), :] += upd
            dw_ref[pl.ds(u, 1), :] = jnp.sum(rows * drow, axis=1).reshape(1, 2)
        return 0

    jax.lax.fori_loop(0, dout_ref.shape[0], body, 0)
    if scratch:
        acc_ref[...] = acc32_ref[...].astype(acc_ref.dtype)


def _scatter_dw_acc_pairs(idx2, wa, wb, value_pad, dout):
    """idx2/wa/wb (G, nU2); value_pad (G, L2, c) float; dout (G, Q, c) f32
    -> (acc (G, L2, c) in value dtype, dw (G, nU2, 2) f32)."""
    G, nU2 = idx2.shape
    _, L2, c = value_pad.shape
    _, Q, _ = dout.shape
    widen = value_pad.dtype != jnp.float32
    smem = pl.BlockSpec((None, 1, nU2), lambda g: (g, 0, 0), memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_scatter_dw_pairs_kernel, pairs_per_q=nU2 // Q),
        grid=(G,),
        in_specs=[
            smem,
            smem,
            smem,
            pl.BlockSpec((None, L2, c), lambda g: (g, 0, 0)),
            pl.BlockSpec((None, Q, c), lambda g: (g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, L2, c), lambda g: (g, 0, 0)),
            pl.BlockSpec((None, nU2, 2), lambda g: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, L2, c), value_pad.dtype),
            jax.ShapeDtypeStruct((G, nU2, 2), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((L2, c), jnp.float32)] * 2 if widen else []
        ),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(idx2[:, None], wa[:, None], wb[:, None], value_pad, dout)


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
      rows idx2 and idx2+1 receive the two pair weights. idx2+1 may reach
      row L for the bottom-right pixel (with structural weight 0): such
      pairs are shifted one row up with weights swapped here, so the
      kernels never index past the value block and no spare pad rows are
      needed.
    Returns (B, Q, nh, c) in value.dtype.
    """
    L = value.shape[1]
    at_end = idx2 >= L - 1
    idx2 = jnp.where(at_end, L - 2, idx2)
    w_pairs = jnp.where(at_end[..., None], w_pairs[..., ::-1], w_pairs)
    return _bilinear_fwd_impl(value, idx4, w_pairs, idx2, P)


def _w4_of_pairs(w_pairs):
    B, nU2, nh, _ = w_pairs.shape
    return w_pairs.transpose(0, 1, 3, 2).reshape(B, nU2 * 2, nh)


def _pairs_to_grid(x, G, nU2):
    """(B, nU2, nh) -> (G = B*nh, nU2) head-major."""
    return x.transpose(0, 2, 1).reshape(G, nU2)


def _value_grid(value):
    """(B, L, nh, c) -> (B*nh, L, c) head-major. Keeps the model dtype: at
    640px b8 the f32 copy alone was 550 MB per decoder layer and tipped the
    bf16 b8 train step over HBM; the kernels upcast rows in-register
    instead. No spare pad rows: `bilinear_gather` shifts last-row pairs up
    front, so indices stay in [0, L-2]."""
    B, L, nh, c = value.shape
    return value.transpose(0, 2, 1, 3).reshape(B * nh, L, c)


def _bilinear_fwd_impl(value, idx4, w_pairs, idx2, P):
    if _use_pallas():
        B, L, nh, c = value.shape
        nU2 = idx2.shape[1]
        Q = nU2 // (P * 2)
        G = B * nh
        w_g = w_pairs.astype(jnp.float32).transpose(3, 0, 2, 1).reshape(2, G, nU2)
        out = _gather_acc_pairs(
            _pairs_to_grid(idx2, G, nU2), w_g[0], w_g[1], _value_grid(value), Q
        )
        return out.reshape(B, nh, Q, c).transpose(0, 2, 1, 3).astype(value.dtype)
    return _gather_fwd_impl(value, idx4, _w4_of_pairs(w_pairs), P * 4)


def _bilinear_fwd(value, idx4, w_pairs, idx2, P):
    return _bilinear_fwd_impl(value, idx4, w_pairs, idx2, P), (value, idx4, w_pairs, idx2)


def _bilinear_bwd(P, res, dout):
    value, idx4, w_pairs, idx2 = res
    B, L, nh, c = value.shape
    nU4 = idx4.shape[1]
    nU2 = nU4 // 2
    Q = nU4 // (P * 4)
    dout32 = dout.astype(jnp.float32)
    if _use_pallas():
        G = B * nh
        idx_g = _pairs_to_grid(idx2, G, nU2)
        # (B, nU2, nh, 2) -> (2, B*nh, nU2): contiguous per-slot weight
        # planes (a trailing stride-2 slice feeding SMEM costs a copy)
        w_g = w_pairs.astype(jnp.float32).transpose(3, 0, 2, 1).reshape(2, G, nU2)
        dout_g = dout32.transpose(0, 2, 1, 3).reshape(G, Q, c)
        # one fused pass: dvalue scatter + per-pair value.dout dots (a
        # standalone XLA re-gather for dw would cost the full 32 ms gather)
        dv, dw_g = _scatter_dw_acc_pairs(
            idx_g, w_g[0], w_g[1], _value_grid(value), dout_g
        )
        dv = dv.reshape(B, nh, L, c).transpose(0, 2, 1, 3)
        dw_pairs = dw_g.reshape(B, nh, nU2, 2).transpose(0, 2, 1, 3)
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
        ).reshape(B, nU2, 2, nh)
        dw_pairs = dw4.transpose(0, 1, 3, 2)
    return dv.astype(value.dtype), None, dw_pairs.astype(w_pairs.dtype), None


bilinear_gather.defvjp(_bilinear_fwd, _bilinear_bwd)
