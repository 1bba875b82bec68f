"""A/B: deform value projection to head-major layout.

The r5 trace shows the per-decoder-layer value path costs ~1.06 ms of pure
layout copies after the value_proj Dense (conv_add output relayout 0.405 +
(B, nh, L, c) transpose 0.657, bf16 b4). Candidate: project straight to
head-major with one einsum per head-group, writing (B, nh, L, c)
contiguously. r4 measured the einsum SLOWER at f32 with per-level slicing
downstream (NOTES.md dead-ends); re-measure in the r5 multi-level regime.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_valueproj.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from tamtr_tpu.utils.jax_setup import setup_jax

setup_jax()

B, L, C, NH = 4, 33600, 512, 8
c = C // NH
K = 32


def timed(label, fn, *args):
    jf = jax.jit(fn)
    out = jf(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = jf(*args)
        _ = float(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, (time.time() - t0) / K * 1000)
    print(f"{label}: {best:.3f} ms/iter")
    return best


def main():
    rng = np.random.default_rng(0)
    for dtype in (jnp.bfloat16,):
        x = jnp.asarray(rng.standard_normal((B, L, C)), dtype)
        W = jnp.asarray(rng.standard_normal((C, C)) * 0.03, dtype)
        b = jnp.asarray(rng.standard_normal((C,)) * 0.1, dtype)

        def dense_transpose(x, W, b):
            def body(carry, _):
                v = carry @ W + b
                vt = v.reshape(B, L, NH, c).transpose(0, 2, 1, 3)  # (B,nh,L,c)
                s = vt.astype(jnp.float32).sum((1, 3))  # (B, L) consume head-major
                return carry + s[..., None].astype(carry.dtype) * 1e-6, None

            out, _ = jax.lax.scan(body, x, None, length=K)
            return out

        def einsum_hm(x, W, b):
            W3 = W.reshape(C, NH, c)
            b2 = b.reshape(NH, c)

            def body(carry, _):
                vt = jnp.einsum("blc,chd->bhld", carry, W3) + b2[None, :, None, :]
                s = vt.astype(jnp.float32).sum((1, 3))
                return carry + s[..., None].astype(carry.dtype) * 1e-6, None

            out, _ = jax.lax.scan(body, x, None, length=K)
            return out

        print(f"dtype={dtype.__name__} shapes ({B},{L},{C}) nh={NH}")
        timed("dense+transpose", dense_transpose, x, W, b)
        timed("einsum head-major", einsum_hm, x, W, b)


if __name__ == "__main__":
    main()
