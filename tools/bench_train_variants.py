"""Measure the full train step under compute-dtype variants, chained.

Chains K dependent steps inside one jit (state is the lax.scan carry) so the
~30 ms axon dispatch+fetch round-trip is amortized — the per-call-fetch loop
in bench.py measures tunnel latency on top of device time.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_train_variants.py [fp32|bf16 ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tamtr_tpu.utils.jax_setup import setup_jax

setup_jax()

from tamtr_tpu.losses.detr_loss import DETRLossConfig
from tamtr_tpu.nn.graph import TAMTRModel
from tamtr_tpu.train.trainer import TrainConfig, create_train_state, make_train_step

B, M, NC, SZ = 4, 300, 10, 640
K = 8  # chained steps per timed call


def measure(dtype_name: str) -> tuple[float, float]:
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    model = TAMTRModel.from_yaml("tamtr.yaml", nc=NC, max_gt=M, remat=True, dtype=dtype)
    cfg = TrainConfig(batch_size=B, warmup_iters=100, epochs=10, accumulate=1)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), cfg, (B, SZ, SZ, 3), NC,
        steps_per_epoch=100, max_gt=M,
    )
    step = make_train_step(model, tx, DETRLossConfig(nc=NC), cfg)
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.random((B, SZ, SZ, 3), dtype=np.float32)),
        "txt_feats": jnp.asarray(rng.standard_normal((B, NC, 512)).astype(np.float32)),
        "cls": jnp.asarray(rng.integers(0, NC, (B, M)).astype(np.int32)),
        "bboxes": jnp.asarray(np.clip(rng.random((B, M, 4)), 0.05, 0.95).astype(np.float32)),
        "mask": jnp.asarray(np.arange(M)[None] < 40).astype(bool).repeat(B, 0),
    }

    @jax.jit
    def chained(state, batch, key):
        def body(carry, i):
            st, k = carry
            k, sub = jax.random.split(k)
            st, m = step(st, batch, sub)
            return (st, k), m["loss"]

        (state, _), losses = jax.lax.scan(body, (state, key), jnp.arange(K))
        return state, losses

    t0 = time.time()
    state, losses = chained(state, batch, jax.random.PRNGKey(1))
    print(f"[{dtype_name}] compile+first: {time.time() - t0:.1f}s "
          f"loss={float(losses[-1]):.3f}", flush=True)
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        state, losses = chained(state, batch, jax.random.PRNGKey(2 + i))
        float(losses[-1])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"[{dtype_name}] chained step: {best * 1e3:.1f} ms  "
          f"({B / best:.2f} img/s)", flush=True)
    return B / best, best * 1e3


if __name__ == "__main__":
    variants = sys.argv[1:] or ["fp32", "bf16"]
    for v in variants:
        measure(v)
