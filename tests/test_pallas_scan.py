"""Pallas selective-scan kernel vs the XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from tamtr_tpu.kernels.selective_scan import selective_scan_pallas
from tamtr_tpu.nn.ssm import selective_scan_xla


def _args(rng, G, L, Din, N):
    return (
        jnp.asarray(rng.standard_normal((G, L, Din)).astype(np.float32)),
        jnp.asarray((np.abs(rng.standard_normal((G, L, Din))) * 0.1).astype(np.float32)),
        jnp.asarray((-np.abs(rng.standard_normal((G, Din, N)))).astype(np.float32)),
        jnp.asarray(rng.standard_normal((G, L, N)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((G, L, N)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((G, Din)).astype(np.float32)),
    )


def test_pallas_matches_xla(rng):
    a = _args(rng, 2, 100, 8, 4)  # odd L exercises padding
    got = np.asarray(selective_scan_pallas(*a, 64))
    want = np.asarray(selective_scan_xla(*a, chunk=16))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_pallas_d_blocking(rng):
    a = _args(rng, 2, 70, 256, 4)  # D > Dblk=128 exercises the D grid axis
    got = np.asarray(selective_scan_pallas(*a, 32))
    want = np.asarray(selective_scan_xla(*a, chunk=32))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_pallas_grad(rng):
    a = _args(rng, 1, 40, 8, 4)

    def f_p(*args):
        return selective_scan_pallas(*args, 16).sum()

    def f_x(*args):
        return selective_scan_xla(*args, chunk=16).sum()

    gp = jax.grad(f_p, argnums=(0, 1, 2, 3, 4, 5))(*a)
    gx = jax.grad(f_x, argnums=(0, 1, 2, 3, 4, 5))(*a)
    for p, x in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(p), np.asarray(x), atol=1e-4, rtol=1e-4)


def test_pallas_grad_bf16_inputs(rng):
    """The unfused entry documents non-fp32 upcast; its backward must honor
    that under grad too (the vjp residuals/cotangent are upcast to fp32 and
    the returned cotangents cast back — a bf16 dy against the fp32-output
    oracle would otherwise raise a cotangent-dtype error)."""
    a = list(_args(rng, 1, 24, 8, 4))
    for i in (0, 1, 3, 4):  # u, delta, Bs, Cs in bf16; A/D stay fp32
        a[i] = a[i].astype(jnp.bfloat16)

    def f(*args):
        return selective_scan_pallas(*args, 16).astype(jnp.float32).sum()

    g = jax.grad(f, argnums=(0, 1, 2, 3, 4, 5))(*a)
    for i, p in enumerate(g):
        assert p.dtype == a[i].dtype, f"cotangent {i}: {p.dtype} != {a[i].dtype}"
        assert bool(jnp.isfinite(p.astype(jnp.float32)).all())


def _ss2d_args(rng, B=2, H=6, W=8, Din=8, N=4, R=4):
    L = H * W
    xm = rng.standard_normal((B, H, W, Din)).astype(np.float32)
    x_row = xm.reshape(B, L, Din)
    x_col = xm.transpose(0, 2, 1, 3).reshape(B, L, Din)
    layouts = jnp.asarray(np.stack([x_row, x_col], 1))
    dts_raw = jnp.asarray(rng.standard_normal((B, 2, 2, L, R)).astype(np.float32) * 0.2)
    dt_w = jnp.asarray(rng.standard_normal((4, Din, R)).astype(np.float32) * 0.3)
    dt_b = jnp.asarray(rng.standard_normal((4, Din)).astype(np.float32) * 0.1)
    A = jnp.asarray(-np.abs(rng.standard_normal((4, Din, N))).astype(np.float32))
    Bs = jnp.asarray(rng.standard_normal((B, 2, 2, L, N)).astype(np.float32))
    Cs = jnp.asarray(rng.standard_normal((B, 2, 2, L, N)).astype(np.float32))
    Ds = jnp.asarray(rng.standard_normal((4, Din)).astype(np.float32))
    return layouts, dts_raw, dt_w, dt_b, A, Bs, Cs, Ds


def test_ss2d_scan_pallas_matches_xla(rng):
    from tamtr_tpu.kernels.selective_scan import ss2d_scan, ss2d_scan_xla

    args = _ss2d_args(rng)
    got = np.asarray(ss2d_scan(*args, 16))
    want = np.asarray(ss2d_scan_xla(*args, chunk=8))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_ss2d_scan_xla_matches_flip_composition(rng):
    """The reverse-mode formulation equals explicit CrossScan flips."""
    from tamtr_tpu.kernels.selective_scan import ss2d_scan_xla

    B, H, W, Din, N, R = 1, 4, 6, 8, 4, 4
    L = H * W
    args = _ss2d_args(rng, B, H, W, Din, N, R)
    layouts, dts_raw, dt_w, dt_b, A, Bs, Cs, Ds = args
    got = np.asarray(ss2d_scan_xla(*args, chunk=8))
    # explicit flip composition per direction
    for k in range(4):
        lay = np.asarray(layouts[:, k % 2])
        dtr = np.asarray(dts_raw[:, k // 2, k % 2])
        Bk = np.asarray(Bs[:, k // 2, k % 2])
        Ck = np.asarray(Cs[:, k // 2, k % 2])
        if k >= 2:
            lay, dtr, Bk, Ck = lay[:, ::-1], dtr[:, ::-1], Bk[:, ::-1], Ck[:, ::-1]
        dt = np.log1p(np.exp(dtr @ np.asarray(dt_w[k]).T + np.asarray(dt_b[k])))
        y = np.zeros((B, L, Din), np.float32)
        h = np.zeros((B, Din, N), np.float32)
        Ak = np.asarray(A[k])
        for t in range(L):
            a = np.exp(dt[:, t][:, :, None] * Ak[None])
            b = (dt[:, t] * lay[:, t])[:, :, None] * Bk[:, t][:, None, :]
            h = a * h + b
            y[:, t] = np.einsum("bdn,bn->bd", h, Ck[:, t])
        if k >= 2:
            y = y[:, ::-1]
        y = y + np.asarray(layouts[:, k % 2]) * np.asarray(Ds[k])[None, None]
        np.testing.assert_allclose(got[:, k], y, atol=1e-3, rtol=1e-3)


def test_ss2d_module_pallas_equals_xla(rng):
    """The SS2D flax module gives the same output under both scan impls."""
    import jax

    from tamtr_tpu.nn import ssm

    m = ssm.SS2D(d_model=16, scan_chunk=16)
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 16)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    ssm.set_scan_impl("xla")
    y_x = np.asarray(m.apply(params, x))
    ssm.set_scan_impl("pallas")
    y_p = np.asarray(m.apply(params, x))
    ssm.set_scan_impl("auto")
    np.testing.assert_allclose(y_p, y_x, atol=1e-4, rtol=1e-4)


def test_ss2d_bwd_pallas_matches_xla(rng):
    """Pallas backward (carrier + reverse-walk kernels) vs XLA VJP oracle."""
    import tamtr_tpu.kernels.selective_scan as ssk

    args = _ss2d_args(rng, B=2, H=4, W=10, Din=8, N=4, R=4)  # Lp padding exercised

    def loss_p(*a):
        return (ssk.ss2d_scan(*a, 16) * jnp.arange(1, 5)[None, :, None, None]).sum()

    def loss_x(*a):
        return (ssk.ss2d_scan_xla(*a, chunk=8) * jnp.arange(1, 5)[None, :, None, None]).sum()

    ssk.set_ss2d_bwd_impl("pallas")
    try:
        gp = jax.grad(loss_p, argnums=tuple(range(8)))(*args)
    finally:
        ssk.set_ss2d_bwd_impl("pallas")
    gx = jax.grad(loss_x, argnums=tuple(range(8)))(*args)
    names = ["layouts", "dts_raw", "dt_w", "dt_b", "A", "Bs", "Cs", "Ds"]
    for n, p, x in zip(names, gp, gx):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(x), atol=2e-3, rtol=2e-3, err_msg=n
        )


def test_ss2d_scan_bf16_io(rng):
    """bf16 sequence I/O: fwd matches the fp32 oracle within bf16 tolerance,
    cotangent dtypes match the primals, grads track the fp32 reference."""
    import tamtr_tpu.kernels.selective_scan as ssk

    args = list(_ss2d_args(rng, B=1, H=4, W=6, Din=8, N=4, R=4))
    # sequence tensors in bf16, params fp32 (the SS2D bf16-mode contract)
    bf = jnp.bfloat16
    args_bf = list(args)
    for i in (0, 1, 5, 6):  # layouts, dts_raw, Bs, Cs
        args_bf[i] = args[i].astype(bf)

    y32 = np.asarray(ssk.ss2d_scan(*args, 16), np.float32)
    y_bf = ssk.ss2d_scan(*args_bf, 16)
    assert y_bf.dtype == bf
    np.testing.assert_allclose(np.asarray(y_bf, np.float32), y32, atol=0.15, rtol=0.08)
    # XLA oracle honors the same I/O contract
    y_bf_xla = ssk.ss2d_scan_xla(*args_bf, chunk=8)
    assert y_bf_xla.dtype == bf
    np.testing.assert_allclose(
        np.asarray(y_bf_xla, np.float32), y32, atol=0.15, rtol=0.08
    )

    def loss(fn, a):
        return (fn(*a, 16) * jnp.arange(1, 5)[None, :, None, None]).sum()

    ssk.set_ss2d_bwd_impl("pallas")
    g_bf = jax.grad(lambda *a: loss(ssk.ss2d_scan, a), argnums=tuple(range(8)))(*args_bf)
    g32 = jax.grad(lambda *a: loss(ssk.ss2d_scan, a), argnums=tuple(range(8)))(*args)
    for i, (p, x) in enumerate(zip(g_bf, g32)):
        assert p.dtype == args_bf[i].dtype, f"cotangent {i} dtype {p.dtype}"
        np.testing.assert_allclose(
            np.asarray(p, np.float32), np.asarray(x, np.float32),
            atol=0.3, rtol=0.15, err_msg=f"arg {i}",
        )
