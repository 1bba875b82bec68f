"""Pallas TPU selective-scan (S6) kernel.

Replaces the reference's CUDA `selective_scan_cuda_core` (SURVEY.md §2.6 #1)
with a streaming TPU kernel:

- Grid (G, L/S): for each scan group g (batch x direction), the sequence is
  processed in chunks of S positions; the (N, D) recurrent state lives in
  VMEM scratch and is carried across the sequential chunk iterations of the
  grid (TPU grids execute sequentially on a core, minor axis fastest).
- Within a chunk, the pairwise first-order recurrence
      h_t = a_t * h_{t-1} + b_t,  a = exp(dt*A),  b = (dt*u) * B
  is computed with a Hillis-Steele inclusive scan (log2(S) rounds of
  `pltpu.roll` + fused multiply-add), entirely in VMEM. The decay/input
  tensors (S, N, D) are *created in-kernel* from the compact (S, D)/(S, N)
  inputs, so HBM traffic is just u/dt/y + tiny B/C — the XLA path's
  chunk-transposed copies and (L, N, D) intermediates never touch HBM.
- fp32 throughout (reference force_fp32 semantics).

The backward pass runs the same kernel machinery twice (recompute h, then a
reverse-time scan for dL/dh) — see `_selective_scan_bwd`.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_CHUNK = 256
# D-block width: bigger blocks give the sequential scan steps more parallel
# work (ILP) per step (the kernel is bound by per-step latency, not HBM);
# bounded by VMEM (a+b live at (S, N, Dblk) fp32 x2). Measured on v5e at the
# three production shapes: 512 beats 128 by ~1.5x end to end.
DBLK = 512
# sub-chunk width for the seeded scan's sequential passes
SCAN_T = 16
# raise the Mosaic scoped-VMEM cap (default 16 MiB) so wider D blocks fit;
# v5e VMEM is far larger, and wider blocks amortize per-grid-step overhead
import os as _os

VMEM_LIMIT = int(_os.environ.get("TAMTR_SCAN_VMEM", 64 * 1024 * 1024))
DBLK = int(_os.environ.get("TAMTR_SCAN_DBLK", 0)) or DBLK
SCAN_IMPL_HDIRECT = _os.environ.get("TAMTR_SCAN_HDIRECT", "1") == "1"
# backward-kernel D-block width: the bwd holds ~8 (S, N, Dblk) fp32 buffers
# live (S=128), so 128 keeps the working set ~6.7 MB; wider blocks measured
# on v5e after the seeded-replay rewrite — see tools/bench_scan.py
BWD_DBLK = int(_os.environ.get("TAMTR_SCAN_BWD_DBLK", 0)) or 512
BWD_CHUNK = int(_os.environ.get("TAMTR_SCAN_BWD_CHUNK", 0)) or 256


def _compiler_params():
    if VMEM_LIMIT <= 0:
        return None
    try:
        return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)
    except (AttributeError, TypeError):  # older pallas naming
        try:
            return pltpu.TPUCompilerParams(vmem_limit_bytes=VMEM_LIMIT)
        except Exception:
            return None


def _interpret() -> bool:
    """Interpret mode off-TPU so CPU tests exercise the same kernel code."""
    return jax.default_backend() != "tpu"


def _scan_kernel(u_ref, dt_ref, A_ref, B_ref, C_ref, y_ref, hlast_ref, h_ref, *, reverse: bool):
    """One (g, chunk) grid step. Refs:
    u, dt: (1, S, D); A: (1, N, D); B, C: (1, S, N);
    y out: (1, S, D); hlast out: (1, N, D); h scratch: (N, D).
    """
    s_idx = pl.program_id(2)  # chunk axis (grid = (G, nD, nS))
    n_s = pl.num_programs(2)

    @pl.when(s_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    u = u_ref[0]  # (S, D)
    dt = dt_ref[0]  # (S, D)
    A = A_ref[0]  # (N, D)
    Bc = B_ref[0]  # (S, N)
    Cc = C_ref[0]  # (S, N)

    a = jnp.exp(dt[:, None, :] * A[None])  # (S, N, D)
    b = (dt * u)[:, None, :] * Bc[:, :, None]  # (S, N, D)

    # Seeded minimum-arithmetic scan (see `_scan_h_direct`); reverse mode
    # runs the mirrored suffix recurrence instead of flipping data.
    y, h_last = _scan_h_direct(a, b, h_ref[...], Cc, reverse)
    y_ref[0] = y
    h_ref[...] = h_last

    @pl.when(s_idx == n_s - 1)
    def _():
        hlast_ref[0] = h_last


def _run_scan(u, dt, A_t, Bs, Cs, chunk: int, reverse: bool):
    """Raw scan: returns y (without the D*u skip) and final states.

    u, dt: (G, L, D); A_t: (G, N, D); Bs, Cs: (G, L, N).
    In reverse mode the recurrence runs from t=L-1 down to 0 (inputs are
    chunk-flipped in-kernel and the grid walks chunks backwards).
    """
    G, L, D = u.shape
    N = A_t.shape[1]
    S = min(chunk, L)
    pad = (-L) % S
    if pad:
        cfg = ((0, 0), (0, pad) if not reverse else (pad, 0), (0, 0))
        u = jnp.pad(u, cfg)
        dt = jnp.pad(dt, cfg)
        Bs = jnp.pad(Bs, cfg)
        Cs = jnp.pad(Cs, cfg)
    Lp = L + pad
    nS = Lp // S
    # D blocking keeps the in-kernel (S, N, Dblk) working set inside VMEM
    # (d_inner reaches 1024 in the level-2 mixer). Use the largest divisor
    # of D that fits DBLK so widths like 768 (not a multiple of 512) work.
    Dblk = min(D, DBLK)
    while D % Dblk != 0:
        Dblk -= 1
    nD = D // Dblk

    def sidx(g, d, s):
        return (g, (nS - 1 - s) if reverse else s, d)

    def aidx(g, d, s):
        return (g, 0, d)

    def bidx(g, d, s):
        return (g, (nS - 1 - s) if reverse else s, 0)

    y, hlast = pl.pallas_call(
        functools.partial(_scan_kernel, reverse=reverse),
        grid=(G, nD, nS),
        in_specs=[
            pl.BlockSpec((1, S, Dblk), sidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Dblk), sidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dblk), aidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, N), bidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, N), bidx, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, S, Dblk), sidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dblk), aidx, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, Lp, D), jnp.float32),
            jax.ShapeDtypeStruct((G, N, D), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N, Dblk), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(u, dt, A_t, Bs, Cs)
    if pad:
        y = y[:, :L] if not reverse else y[:, pad:]
    return y, hlast


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def selective_scan_pallas(u, delta, A, Bs, Cs, D, chunk: int = DEFAULT_CHUNK):
    """Same contract as `selective_scan_xla`:
    u, delta: (G, L, Din); A: (G, Din, N); Bs, Cs: (G, L, N); D: (G, Din) or None.

    This unfused entry is fp32-only in-kernel; non-fp32 inputs are upcast
    (the fused `ss2d_scan` is the bf16-I/O production path).
    """
    out_dtype = u.dtype
    f32 = jnp.float32
    u, delta, Bs, Cs = u.astype(f32), delta.astype(f32), Bs.astype(f32), Cs.astype(f32)
    y, _ = _run_scan(u, delta, A.transpose(0, 2, 1), Bs, Cs, chunk, reverse=False)
    if D is not None:
        y = y + u * D[:, None, :]
    return y.astype(out_dtype)


def _fwd(u, delta, A, Bs, Cs, D, chunk):
    y = selective_scan_pallas(u, delta, A, Bs, Cs, D, chunk)
    return y, (u, delta, A, Bs, Cs, D)


def _bwd(chunk, res, dy):
    """Backward via VJP of the XLA chunked-scan oracle (recompute).

    The forward Pallas kernel stores no residuals; the backward re-derives
    them with the memory-bounded XLA path (`selective_scan_xla`), whose
    chunk remat keeps peak memory at O(G*S*D*N). A fused Pallas backward
    kernel (reverse-time scan for dL/dh) is the planned follow-up.

    Residuals and the incoming cotangent are upcast to fp32 before the vjp
    (the forward upcasts too, so differentiating bf16 inputs would otherwise
    hand a bf16 dy to an fp32-output vjp — a cotangent dtype error); the
    returned cotangents are cast back to each residual's original dtype.
    """
    from tamtr_tpu.nn.ssm import selective_scan_xla

    u, delta, A, Bs, Cs, D = res
    f32 = jnp.float32
    res32 = tuple(r if r is None else r.astype(f32) for r in (u, delta, A, Bs, Cs, D))
    _, vjp = jax.vjp(
        lambda *args: selective_scan_xla(*args, chunk=chunk), *res32
    )
    grads = vjp(dy.astype(f32))
    return tuple(
        g if g is None or r is None else g.astype(r.dtype)
        for g, r in zip(grads, (u, delta, A, Bs, Cs, D))
    )


selective_scan_pallas.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Fused SS2D scan: dt-projection + softplus + D-skip inside the kernel,
# flip directions realized as reverse-mode scans (no flipped copies in HBM).
# ---------------------------------------------------------------------------


def _hs_scan(a, b, axis: int, reverse: bool):
    """In-kernel Hillis-Steele inclusive pair scan along `axis`.

    Forward computes prefix compositions (h_t = a_t h_{t-1} + b_t solved from
    zero state); reverse computes suffix compositions. Identity padding is
    (a=1, b=0).
    """
    S = a.shape[axis]
    pos_shape = [1] * a.ndim
    pos_shape[axis] = S
    pos = jax.lax.broadcasted_iota(jnp.int32, tuple(pos_shape), axis)
    k = 1
    while k < S:
        shift = (S - k) if reverse else k  # circular roll; S-k == -k
        a_n = pltpu.roll(a, shift, axis=axis)
        b_n = pltpu.roll(b, shift, axis=axis)
        valid = (pos < S - k) if reverse else (pos >= k)
        a_n = jnp.where(valid, a_n, 1.0)
        b_n = jnp.where(valid, b_n, 0.0)
        b = b + a * b_n
        a = a * a_n
        k *= 2
    return a, b


def _seq_prefix_T(a4, b4, reverse: bool):
    """Work-efficient inner scan: static unroll over the T axis (axis 1).

    Each step touches one (R, N, D) slice, so total arithmetic is ~4 ops per
    element instead of Hillis-Steele's log2(T) dense rounds. T is small (16)
    so the 16-step serialization is cheap relative to the vector width.
    """
    T = a4.shape[1]
    sl = lambda x, t: jax.lax.slice_in_dim(x, t, t + 1, axis=1)
    order = range(T - 1, -1, -1) if reverse else range(T)
    a_out, b_out = [None] * T, [None] * T
    prev_a = prev_b = None
    for t in order:
        at, bt = sl(a4, t), sl(b4, t)
        if prev_a is None:
            a_out[t], b_out[t] = at, bt
        else:
            a_out[t] = at * prev_a
            b_out[t] = bt + at * prev_b
        prev_a, prev_b = a_out[t], b_out[t]
    return jnp.concatenate(a_out, axis=1), jnp.concatenate(b_out, axis=1)


def _chunk_scan_two_level(a, b, reverse: bool, T: int = 16):
    """Two-level scan of an (S, N, D) chunk: Hillis-Steele within T-wide
    sub-chunks (log2(T) rounds over the full tensor) + a scan over the S/T
    sub-chunk summaries (log2(S/T) rounds over a 1/T-size tensor). ~2x less
    arithmetic than a single log2(S)-round scan over the full tensor.

    Returns (A_full, B_full): the inclusive prefix (or suffix) composition at
    every position, i.e. h_t for zero initial state with a_t factors exposed
    so a carry can be applied as h = A_full * h_in + B_full.
    """
    S, N, D = a.shape
    if S <= T:
        return _hs_scan(a, b, 0, reverse)
    assert S % T == 0
    R = S // T
    a4 = a.reshape(R, T, N, D)
    b4 = b.reshape(R, T, N, D)
    A_in, B_in = _seq_prefix_T(a4, b4, reverse)  # within sub-chunks
    edge = 0 if reverse else T - 1
    a_s = A_in[:, edge]  # (R, N, D) sub-chunk summaries
    b_s = B_in[:, edge]
    A_out, B_out = _hs_scan(a_s, b_s, 0, reverse)  # across sub-chunks (inclusive)
    # exclusive versions: composition of sub-chunks strictly before (after) r
    shift = 1 if not reverse else R - 1
    E_a = pltpu.roll(A_out, shift, axis=0)
    E_b = pltpu.roll(B_out, shift, axis=0)
    rpos = jax.lax.broadcasted_iota(jnp.int32, (R, 1, 1), 0)
    first = (rpos == 0) if not reverse else (rpos == R - 1)
    E_a = jnp.where(first, 1.0, E_a)
    E_b = jnp.where(first, 0.0, E_b)
    # compose: F = In ∘ E  =>  F_a = A_in*E_a, F_b = A_in*E_b + B_in
    A_full = A_in * E_a[:, None]
    B_full = A_in * E_b[:, None] + B_in
    return A_full.reshape(S, N, D), B_full.reshape(S, N, D)


def _scan_h_direct(a, b, h_in, Cc, reverse: bool, T: int = 0):
    """Seeded chunk scan emitting y directly — the minimum-arithmetic form.

    Instead of building full prefix compositions (A_full, B_full) at every
    position (the `_chunk_scan_two_level` route: ~3 extra ops/element for the
    within-scan pair + 3 for the carry compose), run three passes:
      1. sub-chunk (a, b) summaries: sequential over T, keeping only the
         running pair (3 ops/element, one touch);
      2. a tiny sequential state scan over the R = S/T summaries seeded with
         h_in (O(R·N·D), negligible);
      3. a seeded replay h_t = a_t h_{t-1} + b_t fused with the y reduction
         y_t = sum_n C_tn h_tn (4 ops/element, one touch).
    ~10 ops/element total vs ~20+ for the composition route; measured 1.5-2x
    on the production shapes (compute-bound kernel).

    a, b: (S, N, D); h_in: (N, D); Cc: (S, N). Returns (y (S, D), h_last).
    """
    S, N, D = a.shape
    T = T or SCAN_T
    if S % T or S == T:
        T = S  # degenerate: single sub-chunk
    R = S // T
    a4 = a.reshape(R, T, N, D)
    b4 = b.reshape(R, T, N, D)
    C4 = Cc.reshape(R, T, N)
    order = range(T - 1, -1, -1) if reverse else range(T)
    sl = lambda x, t: jax.lax.slice_in_dim(x, t, t + 1, axis=1)

    # pass 1: per-sub-chunk summaries (run_a = prod a, run_b = local state)
    run_a = run_b = None
    for t in order:
        at, bt = sl(a4, t), sl(b4, t)
        if run_a is None:
            run_a, run_b = at, bt
        else:
            run_b = bt + at * run_b
            run_a = at * run_a
    a_s = run_a[:, 0]  # (R, N, D)
    b_s = run_b[:, 0]

    # pass 2: sequential seeded scan across sub-chunk summaries
    seeds = [None] * R  # state entering sub-chunk r
    h = h_in
    r_order = range(R - 1, -1, -1) if reverse else range(R)
    for r in r_order:
        seeds[r] = h
        h = a_s[r] * h + b_s[r]
    h_last = h
    seed = jnp.stack(seeds, 0)  # (R, N, D)

    # pass 3: replay with seeds, reducing y in place
    ys = [None] * T
    h4 = seed
    for t in order:
        h4 = sl(a4, t)[:, 0] * h4 + sl(b4, t)[:, 0]  # (R, N, D)
        ys[t] = jnp.sum(sl(C4, t)[:, 0][:, :, None] * h4, axis=1)  # (R, D)
    y = jnp.stack(ys, 1).reshape(S, D)
    return y, h_last


def _scan_seeded_final(a, b, h_in, reverse: bool, T: int = 0):
    """Minimum-arithmetic final state of a seeded chunk scan (passes 1+2 of
    `_scan_h_direct`): ~3 ops/element, no per-position output.

    a, b: (S, N, D); h_in: (N, D). Returns h after consuming the chunk
    (forward: state after t=S-1; reverse: state after t=0)."""
    S, N, D = a.shape
    T = T or SCAN_T
    if S % T or S == T:
        T = S
    R = S // T
    a4 = a.reshape(R, T, N, D)
    b4 = b.reshape(R, T, N, D)
    order = range(T - 1, -1, -1) if reverse else range(T)
    sl = lambda x, t: jax.lax.slice_in_dim(x, t, t + 1, axis=1)
    run_a = run_b = None
    for t in order:
        at, bt = sl(a4, t), sl(b4, t)
        if run_a is None:
            run_a, run_b = at, bt
        else:
            run_b = bt + at * run_b
            run_a = at * run_a
    a_s = run_a[:, 0]  # (R, N, D)
    b_s = run_b[:, 0]
    h = h_in
    r_order = range(R - 1, -1, -1) if reverse else range(R)
    for r in r_order:
        h = a_s[r] * h + b_s[r]
    return h


def _scan_seeded_all(a, b, h_in, reverse: bool, T: int = 0):
    """Seeded chunk scan materializing the state at EVERY position — the
    backward kernel's analogue of `_scan_h_direct` (same three passes, but
    pass 3 stacks h instead of reducing with C): ~5 ops/element vs ~8 for
    the composition route (`_chunk_scan_two_level` + carry compose).

    a, b: (S, N, D); h_in: (N, D). Returns (h_all (S, N, D), h_final)."""
    S, N, D = a.shape
    T = T or SCAN_T
    if S % T or S == T:
        T = S
    R = S // T
    a4 = a.reshape(R, T, N, D)
    b4 = b.reshape(R, T, N, D)
    order = range(T - 1, -1, -1) if reverse else range(T)
    sl = lambda x, t: jax.lax.slice_in_dim(x, t, t + 1, axis=1)

    run_a = run_b = None
    for t in order:
        at, bt = sl(a4, t), sl(b4, t)
        if run_a is None:
            run_a, run_b = at, bt
        else:
            run_b = bt + at * run_b
            run_a = at * run_a
    a_s = run_a[:, 0]
    b_s = run_b[:, 0]

    seeds = [None] * R
    h = h_in
    r_order = range(R - 1, -1, -1) if reverse else range(R)
    for r in r_order:
        seeds[r] = h
        h = a_s[r] * h + b_s[r]
    h_final = h
    seed = jnp.stack(seeds, 0)  # (R, N, D)

    hs = [None] * T
    h4 = seed
    for t in order:
        h4 = sl(a4, t)[:, 0] * h4 + sl(b4, t)[:, 0]
        hs[t] = h4
    h_all = jnp.stack(hs, 1).reshape(S, N, D)
    return h_all, h_final


def _ss2d_kernel(
    u_ref, dtr_ref, dtw_ref, dtb_ref, A_ref, B_ref, C_ref, D_ref, y_ref, h_ref,
    *, reverse: bool
):
    """Refs: u (1,S,Dblk); dt_raw (1,S,R); dt_w (1,R,Dblk); dt_bias (1,1,Dblk);
    A (1,N,Dblk); B, C (1,S,N); Dskip (1,1,Dblk); y (1,S,Dblk); h scratch (N,Dblk).

    Sequence inputs (u/dt_raw/B/C) and the y output may be bf16 (model
    dtype bf16 halves the scan's HBM traffic); all in-kernel math and the
    recurrent state run fp32 regardless (reference force_fp32 semantics)."""
    s_idx = pl.program_id(2)

    @pl.when(s_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    f32 = jnp.float32
    u = u_ref[0].astype(f32)  # (S, Dblk)
    # dt projection on the MXU + softplus (reference does this as a separate
    # einsum materializing (B, K, L, D) in HBM)
    dt = jnp.dot(dtr_ref[0].astype(f32), dtw_ref[0], preferred_element_type=f32)
    dt = jax.nn.softplus(dt + dtb_ref[0])  # (S, Dblk)
    A = A_ref[0]  # (N, Dblk)
    Bc = B_ref[0].astype(f32)  # (S, N)
    Cc = C_ref[0].astype(f32)  # (S, N)

    a = jnp.exp(dt[:, None, :] * A[None])  # (S, N, Dblk)
    b = (dt * u)[:, None, :] * Bc[:, :, None]

    # Seeded minimum-arithmetic scan. Forward: prefix (h_t = a_t h_{t-1} + b_t);
    # reverse direction runs the mirrored suffix recurrence instead of
    # flipping data (Mosaic has no `rev` lowering; saves the flip traffic).
    if SCAN_IMPL_HDIRECT:
        y, h_last = _scan_h_direct(a, b, h_ref[...], Cc, reverse)
    else:
        S = u.shape[0]
        af, bf = _chunk_scan_two_level(a, b, reverse)
        h_all = af * h_ref[...][None] + bf
        y = jnp.sum(h_all * Cc[:, :, None], axis=1)
        edge = 0 if reverse else S - 1
        h_last = h_all[edge : edge + 1].reshape(h_ref.shape)
    y_ref[0] = (y + u * D_ref[0]).astype(y_ref.dtype)
    h_ref[...] = h_last


def _run_ss2d_scan(u, dt_raw, dt_w, dt_b, A_t, Bs, Cs, Dskip, chunk, reverse):
    """u (G,L,D); dt_raw (G,L,R); dt_w (G,R,D); dt_b (G,1,D); A_t (G,N,D);
    Bs, Cs (G,L,N); Dskip (G,1,D) -> y (G,L,D)."""
    G, L, D = u.shape
    R = dt_raw.shape[-1]
    N = A_t.shape[1]
    S = min(chunk, L)
    pad = (-L) % S
    if pad:
        cfg = ((0, 0), (0, pad) if not reverse else (pad, 0), (0, 0))
        u = jnp.pad(u, cfg)
        dt_raw = jnp.pad(dt_raw, cfg)
        Bs = jnp.pad(Bs, cfg)
        Cs = jnp.pad(Cs, cfg)
    Lp = L + pad
    nS = Lp // S
    Dblk = min(D, DBLK)
    assert D % Dblk == 0
    nD = D // Dblk

    def sidx(g, d, s):
        return (g, (nS - 1 - s) if reverse else s, d)

    def ridx(g, d, s):
        return (g, (nS - 1 - s) if reverse else s, 0)

    def didx(g, d, s):
        return (g, 0, d)

    y = pl.pallas_call(
        functools.partial(_ss2d_kernel, reverse=reverse),
        grid=(G, nD, nS),
        in_specs=[
            pl.BlockSpec((1, S, Dblk), sidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, R), ridx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, Dblk), didx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Dblk), didx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dblk), didx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, N), ridx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, N), ridx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Dblk), didx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, Dblk), sidx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, Lp, D), u.dtype),
        scratch_shapes=[pltpu.VMEM((N, Dblk), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(u, dt_raw, dt_w, dt_b, A_t, Bs, Cs, Dskip)
    if pad:
        y = y[:, :L] if not reverse else y[:, pad:]
    return y


def ss2d_scan_xla(layouts, dts_raw, dt_w, dt_b, A, Bs, Cs, Ds, chunk=128):
    """XLA oracle for the fused 4-direction scan.

    layouts: (B, 2, L, D) [row-major, col-major]; dts_raw: (B, 2, 2, L, R)
    [fwd/rev, layout]; dt_w: (K, D, R); dt_b: (K, D); A: (K, D, N);
    Bs, Cs: (B, 2, 2, L, N); Ds: (K, D). Direction order k = (row-fwd,
    col-fwd, row-rev, col-rev) matching the reference CrossScan.
    Returns y: (B, 4, L, D) per-direction outputs in natural (unflipped) order.

    I/O follows the caller dtype (bf16 under model dtype bf16), all internal
    math fp32 — the same contract as the Pallas kernel.
    """
    from tamtr_tpu.nn.ssm import selective_scan_xla

    out_dtype = layouts.dtype
    f32 = jnp.float32
    layouts, dts_raw, Bs, Cs = (
        layouts.astype(f32), dts_raw.astype(f32), Bs.astype(f32), Cs.astype(f32)
    )
    B, _, L, D = layouts.shape
    N = A.shape[-1]
    ys = []
    for k in range(4):
        rev = k >= 2
        lay = layouts[:, k % 2]
        dtr = dts_raw[:, k // 2, k % 2]
        dt = jax.nn.softplus(jnp.einsum("bl r, d r -> b l d", dtr, dt_w[k]) + dt_b[k])
        u = lay
        Bk = Bs[:, k // 2, k % 2]
        Ck = Cs[:, k // 2, k % 2]
        if rev:
            u, dt, Bk, Ck = u[:, ::-1], dt[:, ::-1], Bk[:, ::-1], Ck[:, ::-1]
        Ak = jnp.broadcast_to(A[k][None], (B, D, N))
        y = selective_scan_xla(u, dt, Ak, Bk, Ck, None, chunk=chunk)
        if rev:
            y = y[:, ::-1]
        y = y + lay * Ds[k][None, None, :]
        ys.append(y)
    return jnp.stack(ys, 1).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def ss2d_scan(layouts, dts_raw, dt_w, dt_b, A, Bs, Cs, Ds, chunk: int = DEFAULT_CHUNK):
    """Fused Pallas 4-direction scan; same contract as `ss2d_scan_xla`."""
    B, _, L, D = layouts.shape
    N = A.shape[-1]
    R = dt_w.shape[-1]

    def prep(ks):
        """Stack two directions (one per layout) into G = 2B sequences."""
        u = layouts.transpose(1, 0, 2, 3).reshape(2 * B, L, D)
        f = ks[0] // 2
        dtr = dts_raw[:, f].transpose(1, 0, 2, 3).reshape(2 * B, L, R)
        Bk = Bs[:, f].transpose(1, 0, 2, 3).reshape(2 * B, L, N)
        Ck = Cs[:, f].transpose(1, 0, 2, 3).reshape(2 * B, L, N)
        sel = jnp.asarray(ks)
        dtw = jnp.repeat(dt_w[sel].transpose(0, 2, 1), B, axis=0)  # (2B, R, D)
        dtb = jnp.repeat(dt_b[sel][:, None, :], B, axis=0)  # (2B, 1, D)
        At = jnp.repeat(A[sel].transpose(0, 2, 1), B, axis=0)  # (2B, N, D)
        Dk = jnp.repeat(Ds[sel][:, None, :], B, axis=0)  # (2B, 1, D)
        return u, dtr, dtw, dtb, At, Bk, Ck, Dk

    y_fwd = _run_ss2d_scan(*prep((0, 1)), chunk, reverse=False)
    y_rev = _run_ss2d_scan(*prep((2, 3)), chunk, reverse=True)
    y_fwd = y_fwd.reshape(2, B, L, D).transpose(1, 0, 2, 3)
    y_rev = y_rev.reshape(2, B, L, D).transpose(1, 0, 2, 3)
    # natural-order per-direction outputs (row-fwd, col-fwd, row-rev, col-rev)
    return jnp.stack([y_fwd[:, 0], y_fwd[:, 1], y_rev[:, 0], y_rev[:, 1]], 1)


def _ss2d_fwd(layouts, dts_raw, dt_w, dt_b, A, Bs, Cs, Ds, chunk):
    y = ss2d_scan(layouts, dts_raw, dt_w, dt_b, A, Bs, Cs, Ds, chunk)
    return y, (layouts, dts_raw, dt_w, dt_b, A, Bs, Cs, Ds)


SS2D_BWD_IMPL = "pallas"  # "pallas" | "xla" (oracle / fallback)


def set_ss2d_bwd_impl(name: str) -> None:
    global SS2D_BWD_IMPL
    assert name in ("pallas", "xla")
    SS2D_BWD_IMPL = name


def _ss2d_bwd(chunk, res, dy):
    if SS2D_BWD_IMPL == "pallas":
        return _ss2d_bwd_pallas(chunk, res, dy)
    args = res
    _, vjp = jax.vjp(lambda *a: ss2d_scan_xla(*a, chunk=min(chunk, 128)), *args)
    return vjp(dy)


ss2d_scan.defvjp(_ss2d_fwd, _ss2d_bwd)


# ---------------------------------------------------------------------------
# Pallas backward for the fused SS2D scan.
#
# Forward (per group g, per (n, d)):
#   z = dt_raw @ dt_w + dt_b;  dt = softplus(z)
#   a_t = exp(dt_t * A);  b_t = (dt_t * u_t) * B_t
#   h_t = a_t h_{t-1} + b_t;  y_t = sum_n C_tn h_tnd + D_d u_td
#
# Given dL/dy:
#   g_t := dL/dh_t = C_t (x) dy_t + a_{t+1} g_{t+1}   (reverse-time scan)
#   dC_tn = sum_d dy h;     dB_tn = sum_d g (dt u)
#   d(dtA)_tnd = g h_{t-1} a;  ddt = sum_n d(dtA) A + (sum_n g B) u
#   du = (sum_n g B) dt + D dy;  dA = sum_t d(dtA) dt;  dD = sum_t dy u
#   dz = ddt * sigmoid(z) = ddt * (1 - exp(-dt))
#
# Two passes: (1) recompute per-chunk incoming states h_in[c] (tiny HBM),
# (2) walk chunks in reverse carrying g in VMEM, recomputing a/b/h per chunk.
# Reverse-direction scans are handled by flipping inputs in XLA and reusing
# the forward-direction backward.
# ---------------------------------------------------------------------------


def _carriers_kernel(u_ref, dtr_ref, dtw_ref, dtb_ref, A_ref, B_ref, hcar_ref, h_ref):
    """Emit the state entering each chunk; update the carried state."""
    s_idx = pl.program_id(2)

    @pl.when(s_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    hcar_ref[0, 0] = h_ref[...]

    f32 = jnp.float32
    u = u_ref[0].astype(f32)
    dt = jnp.dot(dtr_ref[0].astype(f32), dtw_ref[0], preferred_element_type=f32)
    dt = jax.nn.softplus(dt + dtb_ref[0])
    A = A_ref[0]
    Bc = B_ref[0].astype(f32)
    a = jnp.exp(dt[:, None, :] * A[None])
    b = (dt * u)[:, None, :] * Bc[:, :, None]
    h_ref[...] = _scan_seeded_final(a, b, h_ref[...], reverse=False)


def _bwd_kernel(
    u_ref, dtr_ref, dtw_ref, dtb_ref, A_ref, B_ref, C_ref, dy_ref, hcar_ref,
    du_ref, dz_ref, dB_ref, dC_ref, dA_ref,
    g_ref, abound_ref, dAacc_ref,
):
    """One chunk of the backward, chunks walked in reverse time order."""
    s_idx = pl.program_id(2)
    n_s = pl.num_programs(2)

    @pl.when(s_idx == 0)
    def _():
        g_ref[...] = jnp.zeros_like(g_ref)
        abound_ref[...] = jnp.zeros_like(abound_ref)  # a_{L} := 0
        dAacc_ref[...] = jnp.zeros_like(dAacc_ref)

    f32 = jnp.float32
    u = u_ref[0].astype(f32)  # (S, Dblk)
    dt = jnp.dot(dtr_ref[0].astype(f32), dtw_ref[0], preferred_element_type=f32)
    dt = jax.nn.softplus(dt + dtb_ref[0])
    A = A_ref[0]  # (N, Dblk)
    Bc = B_ref[0].astype(f32)  # (S, N)
    Cc = C_ref[0].astype(f32)
    dy = dy_ref[0].astype(f32)  # (S, Dblk)
    S = u.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (S, 1, 1), 0)

    a = jnp.exp(dt[:, None, :] * A[None])  # (S, N, Dblk)
    b = (dt * u)[:, None, :] * Bc[:, :, None]

    # recompute h within chunk from the stored incoming state (seeded replay)
    h_in = hcar_ref[0, 0]  # (N, Dblk)
    h_all, _ = _scan_seeded_all(a, b, h_in, reverse=False)
    h_prev = pltpu.roll(h_all, 1, axis=0)
    h_prev = jnp.where(pos == 0, h_in[None], h_prev)

    # reverse-time g scan: g_t = q_t + a_{t+1} g_{t+1}
    q = dy[:, None, :] * Cc[:, :, None]  # (S, N, Dblk)
    a_next = pltpu.roll(a, S - 1, axis=0)  # a_{t+1} (circular -1)
    a_next = jnp.where(pos == S - 1, abound_ref[...][None], a_next)
    g_in = g_ref[...]  # g of the first element of the later chunk
    g_all, _ = _scan_seeded_all(a_next, q, g_in, reverse=True)

    dtu = (dt * u)[:, None, :]
    dC_ref[0, 0] = jnp.sum(dy[:, None, :] * h_all, axis=2)  # (S, N)
    dB_ref[0, 0] = jnp.sum(g_all * dtu, axis=2)  # (S, N)
    gB = jnp.sum(g_all * Bc[:, :, None], axis=1)  # (S, Dblk)
    ddA = g_all * h_prev * a  # (S, N, Dblk)
    ddt = gB * u + jnp.sum(ddA * A[None], axis=1)
    du_ref[0] = (gB * dt).astype(du_ref.dtype)  # caller adds the D-skip dy * Dskip
    dz_ref[0] = ddt * (1.0 - jnp.exp(-dt))
    dAacc_ref[...] += jnp.sum(ddA * dt[:, None, :], axis=0)

    g_ref[...] = g_all[0:1].reshape(g_in.shape)
    abound_ref[...] = a[0:1].reshape(g_in.shape)

    @pl.when(s_idx == n_s - 1)
    def _():
        dA_ref[0] = dAacc_ref[...]


def _run_ss2d_bwd_fwddir(u, dt_raw, dt_w, dt_b, A_t, Bs, Cs, dy, chunk):
    """Backward of a forward-direction fused scan. Shapes as `_run_ss2d_scan`;
    dy (G, L, D). Returns du_core, dz (G,L,D); dB, dC (G,L,N); dA (G,N,D)."""
    G, L, D = u.shape
    R = dt_raw.shape[-1]
    N = A_t.shape[1]
    S = min(chunk, L)
    pad = (-L) % S
    if pad:
        cfg = ((0, 0), (0, pad), (0, 0))
        u = jnp.pad(u, cfg)
        dt_raw = jnp.pad(dt_raw, cfg)
        Bs = jnp.pad(Bs, cfg)
        Cs = jnp.pad(Cs, cfg)
        dy = jnp.pad(dy, cfg)
    Lp = L + pad
    nS = Lp // S
    Dblk = min(D, BWD_DBLK)
    while D % Dblk != 0:
        Dblk -= 1
    nD = D // Dblk

    fwd = lambda g, d, s: (g, s, d)
    rev = lambda g, d, s: (g, nS - 1 - s, d)
    dcol = lambda g, d, s: (g, 0, d)
    fcol = lambda g, d, s: (g, s, 0)
    rcol = lambda g, d, s: (g, nS - 1 - s, 0)
    car_f = lambda g, d, s: (g, s, 0, d)
    car_r = lambda g, d, s: (g, nS - 1 - s, 0, d)

    hcar = pl.pallas_call(
        _carriers_kernel,
        grid=(G, nD, nS),
        in_specs=[
            pl.BlockSpec((1, S, Dblk), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, R), fcol, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, Dblk), dcol, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Dblk), dcol, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dblk), dcol, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, N), fcol, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, N, Dblk), car_f, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, nS, N, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((N, Dblk), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(u, dt_raw, dt_w, dt_b, A_t, Bs)

    du, dz, dB4, dC4, dA = pl.pallas_call(
        _bwd_kernel,
        grid=(G, nD, nS),
        in_specs=[
            pl.BlockSpec((1, S, Dblk), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, R), rcol, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, Dblk), dcol, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Dblk), dcol, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dblk), dcol, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, N), rcol, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, N), rcol, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Dblk), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N, Dblk), car_r, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, S, Dblk), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Dblk), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, N), lambda g, d, s: (g, d, nS - 1 - s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, N), lambda g, d, s: (g, d, nS - 1 - s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dblk), dcol, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # du follows the input dtype (bf16 halves the dominant write);
            # dz feeds BOTH the bf16 d_dts cotangent and the fp32 dt_w/dt_b
            # param grads, so it stays fp32; dB/dC stay fp32 for the nD-sum
            jax.ShapeDtypeStruct((G, Lp, D), u.dtype),
            jax.ShapeDtypeStruct((G, Lp, D), jnp.float32),
            jax.ShapeDtypeStruct((G, nD, Lp, N), jnp.float32),
            jax.ShapeDtypeStruct((G, nD, Lp, N), jnp.float32),
            jax.ShapeDtypeStruct((G, N, D), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, Dblk), jnp.float32),
            pltpu.VMEM((N, Dblk), jnp.float32),
            pltpu.VMEM((N, Dblk), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(u, dt_raw, dt_w, dt_b, A_t, Bs, Cs, dy, hcar)

    dB = dB4.sum(1)
    dC = dC4.sum(1)
    if pad:
        du, dz, dB, dC = du[:, :L], dz[:, :L], dB[:, :L], dC[:, :L]
    return du, dz, dB, dC, dA


def _ss2d_bwd_pallas(chunk, res, dy):
    """Assemble per-argument gradients from the per-direction kernel passes."""
    layouts, dts_raw, dt_w, dt_b, A, Bs, Cs, Ds = res
    B, _, L, D = layouts.shape
    N = A.shape[-1]
    R = dt_w.shape[-1]
    # the backward holds ~8 (S, N, Dblk) fp32 buffers live after the
    # seeded-replay rewrite; (S, Dblk) = (256, 512) measured fastest on v5e
    # (sweep in tools/bench_scan.py: 95.8 -> 72.0 ms total fwd+bwd)
    S = max(min(chunk, L, BWD_CHUNK), 16)

    d_layouts = jnp.zeros_like(layouts)
    d_dts = jnp.zeros_like(dts_raw)
    d_dtw = jnp.zeros_like(dt_w)
    d_dtb = jnp.zeros_like(dt_b)
    d_A = jnp.zeros_like(A)
    d_Bs = jnp.zeros_like(Bs)
    d_Cs = jnp.zeros_like(Cs)
    d_Ds = jnp.zeros_like(Ds)

    for k in range(4):
        j = k % 2  # layout
        f = k // 2  # 0 = fwd, 1 = rev
        lay = layouts[:, j]
        dtr = dts_raw[:, f, j]
        Bk = Bs[:, f, j]
        Ck = Cs[:, f, j]
        dyk = dy[:, k]
        if f == 1:  # reverse-direction: flip to reuse the forward backward
            lay, dtr, Bk, Ck, dyk = (
                lay[:, ::-1], dtr[:, ::-1], Bk[:, ::-1], Ck[:, ::-1], dyk[:, ::-1]
            )
        dtw_g = jnp.broadcast_to(dt_w[k].T[None], (B, R, D))
        dtb_g = jnp.broadcast_to(dt_b[k][None, None], (B, 1, D))
        A_g = jnp.broadcast_to(A[k].T[None], (B, N, D))
        du, dz, dBk, dCk, dAk = _run_ss2d_bwd_fwddir(
            lay, dtr, dtw_g, dtb_g, A_g, Bk, Ck, dyk, S
        )
        if f == 1:
            du, dz, dBk, dCk = du[:, ::-1], dz[:, ::-1], dBk[:, ::-1], dCk[:, ::-1]
        dy_nat = dy[:, k]
        lay_nat = layouts[:, j]
        dtr_nat = dts_raw[:, f, j]
        # D-skip contributions (outside the kernel); keep cotangent dtypes
        # matching the (possibly bf16) primals, param grads in fp32
        du = du + dy_nat * Ds[k][None, None].astype(dy_nat.dtype)
        d_Ds = d_Ds.at[k].add(
            (dy_nat.astype(jnp.float32) * lay_nat.astype(jnp.float32)).sum((0, 1))
        )
        d_layouts = d_layouts.at[:, j].add(du.astype(d_layouts.dtype))
        d_dts = d_dts.at[:, f, j].add(
            jnp.einsum("bld,dr->blr", dz, dt_w[k]).astype(d_dts.dtype)
        )
        d_dtw = d_dtw.at[k].add(jnp.einsum("bld,blr->dr", dz, dtr_nat.astype(dz.dtype)))
        d_dtb = d_dtb.at[k].add(dz.sum((0, 1)))
        d_A = d_A.at[k].add(dAk.sum(0).T)
        d_Bs = d_Bs.at[:, f, j].add(dBk.astype(d_Bs.dtype))
        d_Cs = d_Cs.at[:, f, j].add(dCk.astype(d_Cs.dtype))
    return d_layouts, d_dts, d_dtw, d_dtb, d_A, d_Bs, d_Cs, d_Ds
