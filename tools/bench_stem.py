"""Microbench: stem conv input-channel padding experiment.

The r4 trace attribution (bench_artifacts/r04/NOTES.md) charges ~9 ms/step of
the grad phase to "stem conv formatting" — XLA:TPU lays the (B, 640, 640, 3)
input out for the MXU convolution, and C_in=3 hits the slow
small-channel path. This measures the stem pattern (conv 3x3 s2 -> 64) with
C_in = 3 vs 4 vs 8 (zero-padded channels; extra kernel input rows are zero so
outputs are bitwise identical), fwd and fwd+bwd, f32 and bf16, chained in one
jit (axon dispatch floor ~30 ms).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_stem.py [--json out.json]
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

B, SZ, COUT, K = 4, 640, 64, 16


def timed(fn, *args):
    jf = jax.jit(fn)
    out = jf(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    best, val = float("inf"), 0.0
    for _ in range(3):
        t0 = time.time()
        out = jf(*args)
        val = float(jax.tree.leaves(out)[0].ravel()[0])  # force a fetch
        best = min(best, (time.time() - t0) / K * 1000)
    return best, val


def run(cin: int, dtype) -> dict:
    rng = np.random.default_rng(0)
    img3 = rng.random((B, SZ, SZ, 3), dtype=np.float32)
    img = np.zeros((B, SZ, SZ, cin), np.float32)
    img[..., :3] = img3
    kern = rng.standard_normal((3, 3, cin, COUT)).astype(np.float32) * 0.1
    kern[:, :, 3:, :] = 0.0
    x = jnp.asarray(img, dtype)
    w = jnp.asarray(kern, dtype)

    def fwd(x, w):
        def body(c, _):
            y = jax.lax.conv_general_dilated(
                x, w, (2, 2), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return c + y.mean(), None

        c, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=K)
        return c

    def fwdbwd(x, w):
        def body(c, _):
            def loss(w):
                y = jax.lax.conv_general_dilated(
                    x, w, (2, 2), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                return (y * y).mean()

            l, g = jax.value_and_grad(loss)(w)
            return c + l + g.mean().astype(dtype), None

        c, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=K)
        return c

    f_ms, f_val = timed(fwd, x, w)
    fb_ms, _ = timed(fwdbwd, x, w)
    return {"cin": cin, "dtype": str(dtype.dtype if hasattr(dtype, 'dtype') else dtype),
            "fwd_ms": round(f_ms, 3), "fwdbwd_ms": round(fb_ms, 3),
            "check": f_val}


def main():
    rows = []
    for dtype in (jnp.float32, jnp.bfloat16):
        for cin in (3, 4, 8):
            r = run(cin, dtype)
            r["dtype"] = "bf16" if dtype == jnp.bfloat16 else "f32"
            print(r, flush=True)
            rows.append(r)
    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
        json.dump(rows, open(out, "w"), indent=1)


if __name__ == "__main__":
    main()
