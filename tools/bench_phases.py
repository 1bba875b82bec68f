"""Phase breakdown of the train step: eval fwd / train fwd / +grad / full.

Each phase is chained K dependent iterations inside ONE jit (the axon
tunnel's ~30 ms dispatch+fetch floor would otherwise dominate), fetched
once. Differences between successive phases isolate:

  train_fwd - eval_fwd   = CDN + denoising queries + loss/matcher cost
  grad      - train_fwd  = backward pass (incl. remat recompute)
  full      - grad       = flat AdamW + EMA + clip + flatten/unravel

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_phases.py [phase ...]
      [--bf16] [--batch=N] [--remat-min=N] [--json out.json]

--json persists the measured numbers as an artifact (VERDICT r3: perf
claims must land as diffable JSON files, not commit prose).
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

from tamtr_tpu.losses.detr_loss import DETRLossConfig, rtdetr_detection_loss
from tamtr_tpu.nn.graph import TAMTRModel
from tamtr_tpu.train.trainer import (
    TrainConfig, create_train_state, flatten_tree, make_train_step,
)

B, M, NC, SZ = 4, 300, 10, 640
K = 8


def build(dtype=jnp.float32, remat_min_elems=0):
    model = TAMTRModel.from_yaml(
        "tamtr.yaml", nc=NC, max_gt=M, remat=True, dtype=dtype,
        remat_min_elems=remat_min_elems,
    )
    cfg = TrainConfig(batch_size=B, warmup_iters=100, epochs=10, accumulate=1)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), cfg, (B, SZ, SZ, 3), NC,
        steps_per_epoch=100, max_gt=M,
    )
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.random((B, SZ, SZ, 3), dtype=np.float32)),
        "txt_feats": jnp.asarray(rng.standard_normal((B, NC, 512)).astype(np.float32)),
        "cls": jnp.asarray(rng.integers(0, NC, (B, M)).astype(np.int32)),
        "bboxes": jnp.asarray(np.clip(rng.random((B, M, 4)), 0.05, 0.95).astype(np.float32)),
        "mask": jnp.asarray(np.arange(M)[None] < 40).astype(bool).repeat(B, 0),
    }
    return model, cfg, state, tx, batch


def timed(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    first = jax.tree.leaves(out)[0]
    float(jnp.asarray(first).ravel()[0])  # fetch forces completion on axon
    print(f"[{name}] compile+first {time.time() - t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        first = jax.tree.leaves(out)[0]
        float(jnp.asarray(first).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"[{name}] {best * 1e3:.1f} ms/step", flush=True)
    return best


def main():
    global B
    args = sys.argv[1:]
    dtype = jnp.float32
    if "--bf16" in args:
        args.remove("--bf16")
        dtype = jnp.bfloat16
    remat_min = 0
    json_out = None
    for a in list(args):
        if a.startswith("--batch="):
            B = int(a.split("=")[1])
            args.remove(a)
        elif a.startswith("--remat-min="):
            remat_min = int(a.split("=")[1])
            args.remove(a)
        elif a.startswith("--json"):
            json_out = a.split("=", 1)[1] if "=" in a else "bench_phases.json"
            args.remove(a)
    phases = args or ["eval_fwd", "train_fwd", "grad", "full"]
    results = {
        "batch": B, "imgsz": SZ, "max_gt": M, "chain": K,
        "dtype": "bfloat16" if dtype == jnp.bfloat16 else "float32",
        "remat_min_elems": remat_min,
        "device": jax.devices()[0].device_kind,
    }
    model, cfg, state, tx, batch = build(dtype, remat_min)
    targets = {"cls": batch["cls"], "bboxes": batch["bboxes"], "mask": batch["mask"]}
    variables = {"params": state.params_tree(), "batch_stats": state.batch_stats}
    loss_cfg = DETRLossConfig(nc=NC)

    if "eval_fwd" in phases:
        @jax.jit
        def eval_chain(variables, img, txt):
            def body(c, _):
                pred = model.apply(variables, c, txt, None, False)["pred"]
                return jnp.clip(c + jnp.tanh(pred.mean()) * 1e-3, 0, 1), None
            return jax.lax.scan(body, img, None, length=K)[0]

        results["eval_fwd_ms"] = 1e3 * timed(
            "eval_fwd", eval_chain, variables, batch["img"], batch["txt_feats"]
        )

    def loss_value(params, img, k):
        k_cdn, k_drop = jax.random.split(k)
        outputs, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            img, batch["txt_feats"], targets, True,
            rngs={"cdn": k_cdn, "dropout": k_drop}, mutable=["batch_stats"],
        )
        loss, _ = rtdetr_detection_loss(outputs, targets, loss_cfg)
        return loss

    if "train_fwd" in phases:
        @jax.jit
        def fwd_chain(params, img, key):
            def body(c, _):
                im, k = c
                k, sub = jax.random.split(k)
                l = loss_value(params, im, sub)
                return (jnp.clip(im + jnp.tanh(l) * 1e-4, 0, 1), k), l
            (_, _), ls = jax.lax.scan(body, (img, key), None, length=K)
            return ls

        results["train_fwd_ms"] = 1e3 * timed(
            "train_fwd", fwd_chain, state.params_tree(), batch["img"], jax.random.PRNGKey(1)
        )

    if "grad" in phases:
        @jax.jit
        def grad_chain(params, img, key):
            def body(c, _):
                im, k = c
                k, sub = jax.random.split(k)
                l, g = jax.value_and_grad(loss_value)(params, im, sub)
                gn = jnp.sqrt(sum(jnp.vdot(x, x) for x in jax.tree.leaves(g)).real)
                return (jnp.clip(im + jnp.tanh(l + gn) * 1e-4, 0, 1), k), gn
            (_, _), gs = jax.lax.scan(body, (img, key), None, length=K)
            return gs

        results["grad_ms"] = 1e3 * timed(
            "grad", grad_chain, state.params_tree(), batch["img"], jax.random.PRNGKey(1)
        )

    if "full" in phases:
        step = make_train_step(model, tx, loss_cfg, cfg)

        @jax.jit
        def full_chain(state, batch, key):
            def body(carry, _):
                st, k = carry
                k, sub = jax.random.split(k)
                st, m = step(st, batch, sub)
                return (st, k), m["loss"]
            (state, _), losses = jax.lax.scan(body, (state, key), None, length=K)
            return losses

        results["full_ms"] = 1e3 * timed("full", full_chain, state, batch, jax.random.PRNGKey(1))


    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {json_out}", flush=True)


if __name__ == "__main__":
    main()
