"""Micro-benchmark the multi-scale deformable-attention core at production
shapes (TAM-TR @640px): forward gather and forward+backward, per decoder
layer, chained inside one jit (the axon tunnel has a ~30 ms per-dispatch
latency floor — see .claude/skills/verify/SKILL.md).

Train mode runs Q = num_dn + nq = 700 queries (max_gt=300 -> one CDN group
of 600) over 3 levels; eval runs Q = 100. The value tensor is the
flattened 3-level feature map (L = 160^2 + 80^2 + 40^2 = 33600, nh=8,
c=64 for hd=512).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_deform.py \
      [--bf16] [--batch=8] [--q=700] [iters]
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

from tamtr_tpu.nn.decoder import ms_deform_attn_core

SHAPES = [(160, 160), (80, 80), (40, 40)]
NH, C = 8, 64
P = 4


def make_args(B, Q, dtype, key):
    L = sum(h * w for h, w in SHAPES)
    ks = jax.random.split(key, 3)
    value = (jax.random.normal(ks[0], (B, L, NH, C), jnp.float32) * 0.1).astype(dtype)
    loc = jax.random.uniform(ks[1], (B, Q, NH, len(SHAPES), P, 2), jnp.float32)
    w = jax.nn.softmax(
        jax.random.normal(ks[2], (B, Q, NH, len(SHAPES) * P), jnp.float32), -1
    ).reshape(B, Q, NH, len(SHAPES), P)
    return value, loc, w


RESULTS = {}


def timed(name, fn, *args, iters):
    out = fn(*args)
    first = jax.tree.leaves(out)[0]
    float(jnp.asarray(first).ravel()[0])  # fetch forces completion on axon
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        first = jax.tree.leaves(out)[0]
        float(jnp.asarray(first).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"[{name}] {best * 1e3:.2f} ms/layer-call", flush=True)
    RESULTS[f"{name}_ms"] = round(best * 1e3, 2)


def main():
    args = sys.argv[1:]
    dtype, B, Q, iters, json_out = jnp.float32, 8, 700, 8, None
    for a in list(args):
        if a == "--bf16":
            dtype = jnp.bfloat16
        elif a.startswith("--batch="):
            B = int(a.split("=")[1])
        elif a.startswith("--q="):
            Q = int(a.split("=")[1])
        elif a.startswith("--json"):
            json_out = a.split("=", 1)[1] if "=" in a else "bench_deform.json"
        else:
            iters = int(a)
    value, loc, w = make_args(B, Q, dtype, jax.random.PRNGKey(0))
    print(f"B={B} Q={Q} dtype={jnp.dtype(dtype).name} L={value.shape[1]}")

    @jax.jit
    def fwd_chain(value, loc, w):
        def body(c, _):
            out = ms_deform_attn_core(c, SHAPES, loc, w)
            bump = (jnp.tanh(out.astype(jnp.float32).mean()) * 1e-3).astype(c.dtype)
            return c + bump, None

        return jax.lax.scan(body, value, None, length=iters)[0]

    timed("fwd", fwd_chain, value, loc, w, iters=iters)

    def loss(value, loc, w):
        out = ms_deform_attn_core(value, SHAPES, loc, w)
        return out.astype(jnp.float32).mean()

    @jax.jit
    def grad_chain(value, loc, w):
        def body(c, _):
            l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(c, loc, w)
            bump = (jnp.tanh(l + g[0].astype(jnp.float32).mean()) * 1e-3).astype(c.dtype)
            return c + bump, None

        return jax.lax.scan(body, value, None, length=iters)[0]

    timed("fwd+bwd", grad_chain, value, loc, w, iters=iters)
    if json_out:
        RESULTS.update({"batch": B, "q": Q, "iters": iters,
                        "dtype": jnp.dtype(dtype).name,
                        "device": jax.devices()[0].device_kind})
        with open(json_out, "w") as f:
            json.dump(RESULTS, f, indent=1)
        print(f"wrote {json_out}", flush=True)


if __name__ == "__main__":
    main()
