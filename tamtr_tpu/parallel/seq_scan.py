"""Sequence-parallel selective scan: shard the token axis over the mesh.

Capability EXTENSION beyond the reference (SURVEY §5.7): the reference
handles its longest sequences (25,600 tokens at stride 4, imgsz 640) with a
single-device linear-time CUDA scan; for larger imagery (>1k px UAV frames)
the sequence itself must shard. The S6 recurrence

    h_t = a_t * h_{t-1} + b_t,    a_t = exp(dt_t * A),   b_t = dt_t*u_t*B_t

is associative, so an L-sharded scan runs as a classic two-phase blocked
scan over the device mesh:

  phase 1 (local, parallel):  each device scans its L/n-token block from a
    zero state, keeping only the block summary — the decay product
    `a_blk = exp(sum_t dt_t * A)` (a plain reduction: the diagonal a_t
    commute) and the final state `h_blk` (the per-token output einsum is
    dead-code-eliminated under jit since only h is used);
  exchange: one `all_gather` of the (G, Din, N) summaries over the mesh
    axis (tiny: n * G*Din*N elements, rides ICI), then every device
    computes the same exclusive prefix `h_in_k = sum_{j<k} (prod_{j<i<k}
    a_i) h_j` with an n-step `lax.scan` (n = mesh size, so this is
    negligible);
  phase 2 (local, parallel): re-scan the block seeded with `h_in` to
    produce the block's outputs.

Total compute ~1.8x one block-scan (phase 1 skips the output projection),
so n devices give ~n/1.8 wall-clock speedup plus an n-fold reduction of the
sequence tensors' per-device memory. Differentiable end to end (shard_map +
collectives have transpose rules).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from tamtr_tpu.nn.ssm import selective_scan_xla
from tamtr_tpu.parallel.mesh import DATA_AXIS

try:  # jax >= 0.8 top-level; fall back to the experimental path on older jax
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def selective_scan_sp(
    u: jnp.ndarray,
    delta: jnp.ndarray,
    A: jnp.ndarray,
    Bs: jnp.ndarray,
    Cs: jnp.ndarray,
    D: Optional[jnp.ndarray],
    mesh: Mesh,
    axis: str = DATA_AXIS,
    chunk: int = 128,
) -> jnp.ndarray:
    """Selective scan with the TOKEN axis sharded over `mesh[axis]`.

    Same contract as `selective_scan_xla` (u/delta (G, L, Din), A (G, Din,
    N), Bs/Cs (G, L, N), D (G, Din) or None), but L is partitioned across
    the mesh axis; L must divide by the axis size. Parameters (A, D)
    replicate; the sequence tensors shard.
    """
    n = int(dict(mesh.shape)[axis])
    G, L, Din = u.shape
    assert L % n == 0, f"token axis {L} must divide over {n} devices"

    def local(u_s, dt_s, A_r, B_s, C_s, D_r):
        # phase 1: block summaries. a_blk via one reduction (diagonal decays
        # commute); h_blk from the state-only scan (y DCE'd: unused).
        a_blk = jnp.exp(jnp.einsum("gld,gdn->gdn", dt_s, A_r))
        # device-varying zeros: a literal jnp.zeros carry would trip the
        # shard_map varying-manual-axes check against the varying scan body
        h_zero = jnp.zeros_like(a_blk)
        _, h_blk = selective_scan_xla(
            u_s, dt_s, A_r, B_s, C_s, None, chunk=chunk, h0=h_zero,
            return_final=True,
        )
        # exchange: every device sees all block summaries, computes the same
        # exclusive prefix, and picks its own incoming state
        a_all = lax.all_gather(a_blk, axis)  # (n, G, Din, N)
        h_all = lax.all_gather(h_blk, axis)

        def step(carry, ab):
            a_j, h_j = ab
            return a_j * carry + h_j, carry  # emitted carry = exclusive prefix

        _, h_in_all = lax.scan(step, jnp.zeros_like(a_blk), (a_all, h_all))
        h_in = jnp.take(h_in_all, lax.axis_index(axis), axis=0)
        # phase 2: the real block scan seeded with the incoming state
        return selective_scan_xla(
            u_s, dt_s, A_r, B_s, C_s, D_r, chunk=chunk, h0=h_in
        )

    seq = P(None, axis, None)
    rep = P()
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(seq, seq, rep, seq, seq, rep),
        out_specs=seq,
        # manual ONLY over the sequence axis: on a 2-D (data, sp) mesh the
        # batch axis stays automatic, so the SP scan composes inside a
        # data-parallel (ZeRO) jitted train step (SURVEY §5.7 composition)
        axis_names={axis},
    )
    if D is None:
        # shard_map needs concrete arrays; thread a zero skip instead of None
        D = jnp.zeros((G, Din), u.dtype)
    return fn(u, delta, A, Bs, Cs, D)


def ss2d_scan_sp(
    layouts: jnp.ndarray,
    dts_raw: jnp.ndarray,
    dt_w: jnp.ndarray,
    dt_b: jnp.ndarray,
    A: jnp.ndarray,
    Bs: jnp.ndarray,
    Cs: jnp.ndarray,
    Ds: jnp.ndarray,
    mesh: Mesh,
    axis: str = "sp",
    chunk: int = 128,
) -> jnp.ndarray:
    """Sequence-parallel 4-direction SS2D scan.

    Same contract as `kernels.selective_scan.ss2d_scan_xla` (layouts
    (B, 2, L, D); dts_raw (B, 2, 2, L, R); dt_w (K, D, R); dt_b (K, D);
    A (K, D, N); Bs/Cs (B, 2, 2, L, N); Ds (K, D) -> y (B, 4, L, D)), but
    every direction's L-scan runs the two-phase blocked `selective_scan_sp`
    over `mesh[axis]`. Reversed directions materialize flipped copies
    (global flips of an L-sharded array lower to a collective permute) —
    the SP path trades those copies for an n-fold cut of per-device
    sequence memory and wall-clock.
    """
    out_dtype = layouts.dtype
    f32 = jnp.float32
    layouts32 = layouts.astype(f32)
    dts32, Bs32, Cs32 = dts_raw.astype(f32), Bs.astype(f32), Cs.astype(f32)
    B, _, L, Dm = layouts.shape
    N = A.shape[-1]
    ys = []
    for k in range(4):
        rev = k >= 2
        lay = layouts32[:, k % 2]
        dtr = dts32[:, k // 2, k % 2]
        dt = jax.nn.softplus(jnp.einsum("blr,dr->bld", dtr, dt_w[k]) + dt_b[k])
        u, Bk, Ck = lay, Bs32[:, k // 2, k % 2], Cs32[:, k // 2, k % 2]
        if rev:
            u, dt, Bk, Ck = u[:, ::-1], dt[:, ::-1], Bk[:, ::-1], Ck[:, ::-1]
        Ak = jnp.broadcast_to(A[k][None], (B, Dm, N))
        y = selective_scan_sp(u, dt, Ak, Bk, Ck, None, mesh, axis=axis, chunk=chunk)
        if rev:
            y = y[:, ::-1]
        ys.append(y + lay * Ds[k][None, None, :])
    return jnp.stack(ys, 1).astype(out_dtype)
