"""VMamba SS2D selective-scan blocks, TPU-native.

Re-design of the reference VMamba subsystem
(`ultralytics/nn/extra_modules/VManba/{vmamba,csms6s,csm_triton}.py`):

- The reference's CUDA `selective_scan_cuda_core` kernel (fwd+bwd, fp32) is
  replaced by a *chunked associative scan*: the S6 recurrence
      h_t = exp(dt_t * A) * h_{t-1} + (dt_t * u_t) * B_t,   y_t = C_t . h_t + D * u_t
  is associative in (a, b) pairs, so each chunk of the sequence is scanned in
  parallel with `lax.associative_scan` while the inter-chunk state is carried
  by a `lax.scan`. This bounds peak memory to O(G * S * D * N) for chunk size
  S instead of O(G * L * D * N) (level 0 has L = 160*160 = 25600 tokens, which
  would be ~1.7 GB/image if materialized). A Pallas kernel can drop in behind
  the same function signature (see tamtr_tpu/kernels/).
- The reference's Triton cross-scan/merge kernels are plain XLA layout ops
  here (transpose/flip/reshape) — XLA fuses them into the surrounding ops.
- Everything is channels-last (B, H, W, C), which is both the reference
  VSSBlock convention (`vmamba.py:1134`) and the TPU-native layout, so the
  NCHW<->NHWC permutes in the reference model disappear entirely.

Numerics follow the reference `forward_type="v2"` path (`vmamba.py:423`):
fp32 scan state (`force_fp32=True`), delta softplus with per-direction bias,
A = -exp(A_log), K = 4 scan directions, LayerNorm out-norm ("v0").
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from tamtr_tpu.nn.layers import DropPath

# Chunk size for the associative-scan selective scan. 128 keeps the per-chunk
# working set ~(G*128*D*N) in fp32 comfortably inside HBM headroom while
# giving the VPU long enough vectors.
SCAN_CHUNK = 128

_SCAN_IMPL = "auto"  # auto: pallas on TPU, xla elsewhere


def set_scan_impl(name: str) -> None:
    global _SCAN_IMPL
    assert name in ("auto", "xla", "pallas")
    _SCAN_IMPL = name


def _combine(e1, e2):
    """Associative combine for first-order linear recurrences."""
    a1, b1 = e1
    a2, b2 = e2
    return a2 * a1, a2 * b1 + b2


@partial(jax.checkpoint, policy=jax.checkpoint_policies.nothing_saveable)
def _scan_chunk(A, h, u_c, dt_c, B_c, C_c):
    """One chunk of the selective scan.

    A: (G, D, N); h: (G, D, N) carry; u_c, dt_c: (G, S, D); B_c, C_c: (G, S, N).
    Returns (h_next, y_c) with y_c: (G, S, D).
    Rematerialized in the backward pass so only chunk carries are stored.
    """
    dA = dt_c[..., None] * A[:, None, :, :]  # (G, S, D, N)
    a = jnp.exp(dA)
    b = (dt_c * u_c)[..., None] * B_c[:, :, None, :]  # (G, S, D, N)
    a_cum, b_scan = lax.associative_scan(_combine, (a, b), axis=1)
    h_t = a_cum * h[:, None] + b_scan  # (G, S, D, N)
    y_c = jnp.einsum("gsdn,gsn->gsd", h_t, C_c)
    return h_t[:, -1], y_c


def selective_scan_xla(
    u: jnp.ndarray,
    delta: jnp.ndarray,
    A: jnp.ndarray,
    Bs: jnp.ndarray,
    Cs: jnp.ndarray,
    D: Optional[jnp.ndarray],
    chunk: int = SCAN_CHUNK,
    h0: Optional[jnp.ndarray] = None,
    return_final: bool = False,
):
    """S6 selective scan, fp32, chunked associative-scan formulation.

    Args:
      u:     (G, L, Din) inputs (already includes any bias/softplus on delta).
      delta: (G, L, Din) timestep (post-softplus).
      A:     (G, Din, N) negative-definite state matrix diag.
      Bs:    (G, L, N) input projection.
      Cs:    (G, L, N) output projection.
      D:     (G, Din) skip, or None.
      h0:    optional (G, Din, N) initial state (zeros when None) — the hook
             the sequence-parallel scan uses to chain device-local blocks.
      return_final: also return the final recurrent state h_L.
    Returns:
      y: (G, L, Din) fp32, or (y, h_L) when `return_final` (callers that use
      only h_L get the per-token y einsum dead-code-eliminated under jit).
    """
    G, L, Din = u.shape
    N = A.shape[-1]
    S = min(chunk, L)
    pad = (-L) % S
    if pad:
        # zero delta => a = 1, b = 0: padding does not disturb the state.
        u = jnp.pad(u, ((0, 0), (0, pad), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, pad), (0, 0)))
        Bs = jnp.pad(Bs, ((0, 0), (0, pad), (0, 0)))
        Cs = jnp.pad(Cs, ((0, 0), (0, pad), (0, 0)))
    Lp = L + pad
    C_chunks = Lp // S

    def to_chunks(x):
        return x.reshape(G, C_chunks, S, x.shape[-1]).transpose(1, 0, 2, 3)

    xs = (to_chunks(u), to_chunks(delta), to_chunks(Bs), to_chunks(Cs))
    h = h0 if h0 is not None else jnp.zeros((G, Din, N), dtype=u.dtype)

    def step(h, inp):
        u_c, dt_c, B_c, C_c = inp
        return _scan_chunk(A, h, u_c, dt_c, B_c, C_c)

    h_final, ys = lax.scan(step, h, xs)
    y = ys.transpose(1, 0, 2, 3).reshape(G, Lp, Din)[:, :L]
    if D is not None:
        y = y + u[:, :L] * D[:, None, :]
    return (y, h_final) if return_final else y


def selective_scan(u, delta, A, Bs, Cs, D, chunk: int = SCAN_CHUNK) -> jnp.ndarray:
    """Dispatch to the active selective-scan implementation."""
    impl = _SCAN_IMPL
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from tamtr_tpu.kernels.selective_scan import selective_scan_pallas

        # the Pallas kernel prefers larger chunks (fewer grid steps)
        return selective_scan_pallas(u, delta, A, Bs, Cs, D, max(chunk, 256))
    return selective_scan_xla(u, delta, A, Bs, Cs, D, chunk=chunk)


# Sequence-parallel activation context: inside `sequence_parallel(mesh)`,
# every SS2D scan whose token axis divides over mesh["sp"] runs the
# two-phase blocked SP scan (parallel/seq_scan.py) instead of the local
# kernel. Trace-time config (like _SCAN_IMPL): set it before jit-tracing
# the step that should shard its sequences.
_SP_CTX = None


class sequence_parallel:
    """Context manager: route SS2D scans sequence-parallel over mesh[axis]."""

    def __init__(self, mesh, axis: str = "sp"):
        self.ctx = (mesh, axis)

    def __enter__(self):
        global _SP_CTX
        self.prev, _SP_CTX = _SP_CTX, self.ctx
        return self

    def __exit__(self, *exc):
        global _SP_CTX
        _SP_CTX = self.prev
        return False


def selective_scan_4dir(
    layouts, dts_raw, dt_w, dt_b, A, Bs, Cs, Ds, chunk: int = SCAN_CHUNK
) -> jnp.ndarray:
    """Fused 4-direction SS2D scan (dt-projection + softplus + D-skip inside).

    See `tamtr_tpu.kernels.selective_scan.ss2d_scan_xla` for the contract.
    """
    if _SP_CTX is not None:
        mesh, axis = _SP_CTX
        n = int(dict(mesh.shape).get(axis, 1))
        if n > 1 and layouts.shape[2] % n == 0:
            from tamtr_tpu.parallel.seq_scan import ss2d_scan_sp

            return ss2d_scan_sp(
                layouts, dts_raw, dt_w, dt_b, A, Bs, Cs, Ds, mesh,
                axis=axis, chunk=chunk,
            )
    impl = _SCAN_IMPL
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    from tamtr_tpu.kernels.selective_scan import ss2d_scan, ss2d_scan_xla

    if impl == "pallas":
        return ss2d_scan(layouts, dts_raw, dt_w, dt_b, A, Bs, Cs, Ds, max(chunk, 256))
    return ss2d_scan_xla(layouts, dts_raw, dt_w, dt_b, A, Bs, Cs, Ds, chunk=chunk)


def cross_scan(x: jnp.ndarray) -> jnp.ndarray:
    """4-direction unfold of (B, H, W, D) -> (B, 4, L, D).

    Directions match the reference CrossScan (`csms6s.py:4-22`):
    k0 row-major, k1 column-major (HW transpose), k2/k3 = reversed k0/k1.
    """
    B, H, W, Dm = x.shape
    k0 = x.reshape(B, H * W, Dm)
    k1 = x.transpose(0, 2, 1, 3).reshape(B, H * W, Dm)
    return jnp.stack([k0, k1, k0[:, ::-1], k1[:, ::-1]], axis=1)


def cross_merge(ys: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Inverse-sum of the 4 directions: (B, 4, L, D) -> (B, L, D) row-major.

    Matches the reference CrossMerge (`csms6s.py:25-33`).
    """
    B, K, L, Dm = ys.shape
    y01 = ys[:, 0] + ys[:, 2, ::-1]
    y11 = ys[:, 1] + ys[:, 3, ::-1]
    y11 = y11.reshape(B, W, H, Dm).transpose(0, 2, 1, 3).reshape(B, L, Dm)
    return y01 + y11


def _dt_bias_init(key, shape, dt_min=0.001, dt_max=0.1, dt_init_floor=1e-4):
    """Softplus-inverse of log-uniform dt (reference `vmamba.py:152-177`)."""
    dt = jnp.exp(
        jax.random.uniform(key, shape) * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min)
    )
    dt = jnp.clip(dt, dt_init_floor, None)
    # inverse softplus: dt + log(1 - exp(-dt))
    return dt + jnp.log(-jnp.expm1(-dt))


class SS2D(nn.Module):
    """2-D selective scan mixer, `forward_type="v2"` semantics (`vmamba.py:330-485, 898-1038`).

    Input/output: (B, H, W, d_model) channels-last.
    """

    d_model: int
    d_state: int = 16
    ssm_ratio: float = 2.0
    dt_rank: int = 0  # 0 => auto = ceil(d_model / 16)
    d_conv: int = 3
    scan_chunk: int = SCAN_CHUNK

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, H, W, C = x.shape
        d_inner = int(self.ssm_ratio * self.d_model)
        R = self.dt_rank or math.ceil(self.d_model / 16)
        N = self.d_state
        K = 4
        L = H * W

        # computation dtype follows the input (bf16 under model.dtype=bf16);
        # with the flax default (None) fp32 params silently promote bf16
        # activations back to fp32 and the MXU runs full precision
        xz = nn.Dense(2 * d_inner, use_bias=False, name="in_proj", dtype=x.dtype)(x)
        xm, z = jnp.split(xz, 2, axis=-1)
        z = nn.silu(z)

        # depthwise 3x3 conv (with bias) + SiLU
        xm = nn.Conv(
            d_inner,
            (self.d_conv, self.d_conv),
            padding="SAME",
            feature_group_count=d_inner,
            use_bias=True,
            name="conv2d",
            dtype=xm.dtype,
        )(xm)
        xm = nn.silu(xm)

        # ---- scan parameters (per direction k) ----
        def xproj_init(key, shape, dtype=jnp.float32):
            # torch Linear default: U(-1/sqrt(in), 1/sqrt(in))
            bound = 1.0 / math.sqrt(shape[-1])
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        x_proj_w = self.param("x_proj_weight", xproj_init, (K, R + 2 * N, d_inner))

        def dtw_init(key, shape, dtype=jnp.float32):
            bound = R**-0.5  # dt_init="random", dt_scale=1.0
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        dt_w = self.param("dt_projs_weight", dtw_init, (K, d_inner, R))
        dt_b = self.param("dt_projs_bias", _dt_bias_init, (K, d_inner))

        def alog_init(key, shape, dtype=jnp.float32):
            a = jnp.log(jnp.arange(1, N + 1, dtype=dtype))  # (N,)
            return jnp.broadcast_to(a, shape)

        A_logs = self.param("A_logs", alog_init, (K, d_inner, N))
        Ds = self.param("Ds", nn.initializers.ones, (K, d_inner))

        # ---- flip-free layout + projections ----
        # Direction k: 0 = row fwd, 1 = col fwd, 2 = row rev, 3 = col rev
        # (reference CrossScan order). Reversed directions never materialize
        # flipped copies: the scan kernel runs them in reverse time.
        #
        # Scan I/O follows the compute dtype: fp32 by default (the reference's
        # force_fp32 semantics end to end) — under model dtype bf16 the big
        # sequence tensors (layouts/dt_raw/B/C in, y out) stay bf16, halving
        # the scan region's HBM traffic, while the kernel still upcasts and
        # carries its recurrent state in fp32 (same accumulation contract as
        # a bf16 matmul on the MXU).
        f32 = jnp.float32
        cd = xm.dtype
        x_row = xm.reshape(B, L, d_inner)
        x_col = xm.transpose(0, 2, 1, 3).reshape(B, L, d_inner)
        layouts = jnp.stack([x_row, x_col], 1).astype(cd)  # (B, 2, L, d_inner)
        Wp = x_proj_w.astype(cd).reshape(2, 2, R + 2 * N, d_inner)  # [f][layout]
        x_dbl = jnp.einsum("bjld,fjcd->bfjlc", layouts, Wp)  # (B,2,2,L,R+2N)
        dts_raw, Bs, Cs = jnp.split(x_dbl, [R, R + N], axis=-1)

        A = -jnp.exp(A_logs.astype(f32))  # (K, d_inner, N)
        ys = selective_scan_4dir(
            layouts,
            dts_raw,
            dt_w.astype(f32),
            dt_b.astype(f32),
            A,
            Bs,
            Cs,
            Ds.astype(f32),
            chunk=self.scan_chunk,
        )  # (B, 4, L, d_inner) natural order
        # merge (reference CrossMerge): row dirs add directly; col dirs
        # transpose back to row-major
        y_col = (ys[:, 1] + ys[:, 3]).reshape(B, W, H, d_inner)
        y_col = y_col.transpose(0, 2, 1, 3).reshape(B, L, d_inner)
        y = ys[:, 0] + ys[:, 2] + y_col  # (B, L, d_inner) compute dtype
        # named checkpoint: with the `save_scan_outputs` remat policy (see
        # decoder.ManbaWorldDecoder) the merged scan output is SAVED across
        # the mixer's remat boundary, so the backward skips re-running the
        # Pallas scan forward (~17 ms/step at 640px b4) for the cost of
        # (B, L, d_inner) per level (~180 MB at b4 fp32, half that bf16)
        from jax.ad_checkpoint import checkpoint_name

        y = checkpoint_name(y, "scan_out")

        # epsilon=1e-5 on every torch-parity LayerNorm: torch nn.LayerNorm
        # defaults to 1e-5, flax to 1e-6 — the mismatch costs ~2e-3 per
        # block and compounds through the head (found by ported-weight
        # full-model parity, tests/test_port.py)
        y = nn.LayerNorm(epsilon=1e-5, name="out_norm", dtype=jnp.float32)(y)
        y = y.astype(x.dtype).reshape(B, H, W, d_inner)
        y = y * z
        return nn.Dense(self.d_model, use_bias=False, name="out_proj", dtype=y.dtype)(y)


class Mlp(nn.Module):
    """GELU MLP used inside VSSBlock (`vmamba.py` Mlp)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, name="fc1", dtype=x.dtype)(x)
        x = nn.gelu(x)
        return nn.Dense(self.out, name="fc2", dtype=x.dtype)(x)


class VSSBlock(nn.Module):
    """Pre-norm residual SS2D + MLP block (`vmamba.py:1169-1256`).

    Input/output: (B, H, W, C) channels-last.
    """

    hidden_dim: int
    drop_path: float = 0.0
    ssm_d_state: int = 16
    ssm_ratio: float = 2.0
    mlp_ratio: float = 4.0
    scan_chunk: int = SCAN_CHUNK

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=x.dtype)(x)
        y = SS2D(
            self.hidden_dim,
            d_state=self.ssm_d_state,
            ssm_ratio=self.ssm_ratio,
            scan_chunk=self.scan_chunk,
            name="op",
        )(y, train)
        x = x + DropPath(self.drop_path, name="drop_path1")(y, deterministic=not train)
        y = nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=x.dtype)(x)
        y = Mlp(int(self.hidden_dim * self.mlp_ratio), self.hidden_dim, name="mlp")(y)
        return x + DropPath(self.drop_path, name="drop_path2")(y, deterministic=not train)
