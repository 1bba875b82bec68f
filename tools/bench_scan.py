"""Micro-benchmark the fused SS2D Pallas scan at production shapes.

Times forward and forward+backward per mixer level (TAM-TR @640px, b4),
chained inside one jit to avoid the ~30 ms tunnel round-trip per call
(see .claude/skills/verify/SKILL.md). Reports ms and effective VPU GFLOP/s
(counting ~17 fp32 ops/element: exp+a/b construction ~7, pass1 3, pass3 4,
plus C-reduction overheads).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_scan.py [iters]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tamtr_tpu.utils.jax_setup import setup_jax

setup_jax()

from tamtr_tpu.kernels.selective_scan import ss2d_scan

B = 4
N = 16
LEVELS = [  # (H, W, d_inner) for the 3 mixer levels at 640px
    (160, 160, 256),
    (80, 80, 512),
    (40, 40, 1024),
]
JSON_OUT = None
_argv = [a for a in sys.argv[1:]]
for _a in list(_argv):
    if _a.startswith("--json"):
        JSON_OUT = _a.split("=", 1)[1] if "=" in _a else "bench_scan.json"
        _argv.remove(_a)
ITERS = int(_argv[0]) if _argv else 8


def make_args(H, W, D, key):
    L = H * W
    R = max(D // 2 // 16, 1)  # dt_rank = ceil(d_model/16), d_model = D/2
    ks = jax.random.split(key, 8)
    layouts = jax.random.normal(ks[0], (B, 2, L, D), jnp.float32) * 0.1
    dts_raw = jax.random.normal(ks[1], (B, 2, 2, L, R), jnp.float32) * 0.1
    dt_w = jax.random.normal(ks[2], (4, D, R), jnp.float32) * 0.1
    dt_b = jax.random.normal(ks[3], (4, D), jnp.float32) * 0.1 - 4.0
    A = -jnp.exp(jax.random.normal(ks[4], (4, D, N), jnp.float32) * 0.2)
    Bs = jax.random.normal(ks[5], (B, 2, 2, L, N), jnp.float32) * 0.1
    Cs = jax.random.normal(ks[6], (B, 2, 2, L, N), jnp.float32) * 0.1
    Ds = jnp.ones((4, D), jnp.float32)
    return layouts, dts_raw, dt_w, dt_b, A, Bs, Cs, Ds


def chain_fwd(args, iters):
    """Chain iters dependent forward calls; fold y back into layouts."""

    def body(carry, _):
        layouts = carry
        y = ss2d_scan(layouts, *args[1:])
        new = layouts + 1e-6 * jnp.stack(
            [y[:, 0] + y[:, 2], y[:, 1] + y[:, 3]], 1
        )
        return new, ()

    out, _ = jax.lax.scan(body, args[0], None, length=iters)
    return out


def chain_fwdbwd(args, iters):
    def loss_fn(layouts):
        y = ss2d_scan(layouts, *args[1:])
        return jnp.sum(y * y) * 1e-6

    def body(carry, _):
        layouts = carry
        g = jax.grad(loss_fn)(layouts)
        return layouts + 1e-6 * g, ()

    out, _ = jax.lax.scan(body, args[0], None, length=iters)
    return out


def run(fn, args, iters, label, flops_per_iter):
    # fetch only a scalar; subtract the 1-iter time to drop fixed overheads
    f1 = jax.jit(lambda a: jnp.sum(fn(a, 1)))
    fN = jax.jit(lambda a: jnp.sum(fn(a, iters)))
    float(f1(args)), float(fN(args))  # compile + run once
    t0 = time.perf_counter()
    float(f1(args))
    t1 = time.perf_counter()
    float(fN(args))
    t2 = time.perf_counter()
    dt = (t2 - t1) - (t1 - t0)
    ms = dt / (iters - 1) * 1e3
    print(
        f"{label:28s} {ms:8.2f} ms/iter   "
        f"{flops_per_iter * (iters - 1) / dt / 1e9:8.1f} GFLOP/s"
    )
    return ms


def main():
    total_fwd = total_bwd = 0.0
    results = {"batch": B, "iters": ITERS, "device": jax.devices()[0].device_kind,
               "levels": {}}
    for H, W, D in LEVELS:
        L = H * W
        args = make_args(H, W, D, jax.random.PRNGKey(L))
        # ~17 ops/element x 4 directions x B
        flops = 17.0 * B * 4 * L * N * D
        ms_f = run(chain_fwd, args, ITERS, f"L{H}x{W} D{D} fwd", flops)
        ms_fb = run(chain_fwdbwd, args, ITERS, f"L{H}x{W} D{D} fwd+bwd", flops * 3)
        total_fwd += ms_f
        total_bwd += ms_fb
        results["levels"][f"{H}x{W}xD{D}"] = {
            "fwd_ms": round(ms_f, 2), "fwdbwd_ms": round(ms_fb, 2)}
    print(f"\ntotal fwd: {total_fwd:.1f} ms   total fwd+bwd: {total_bwd:.1f} ms")
    results["total_fwd_ms"] = round(total_fwd, 2)
    results["total_fwdbwd_ms"] = round(total_bwd, 2)
    if JSON_OUT:
        with open(JSON_OUT, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {JSON_OUT}")


if __name__ == "__main__":
    main()
