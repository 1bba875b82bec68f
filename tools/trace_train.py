"""Profiler trace of the full bf16 train step with category attribution
(r5 counterpart of r4's NOTES.md grad-step table). Reuses bench_phases'
model/step construction at the recipe shapes.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/trace_train.py [--batch=N]
"""

import glob, gzip, json, sys, time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from tamtr_tpu.utils.jax_setup import setup_jax

setup_jax()

from tamtr_tpu.losses.detr_loss import DETRLossConfig
from tamtr_tpu.nn.graph import TAMTRModel
from tamtr_tpu.train.trainer import TrainConfig, create_train_state, make_train_step

B = 4
for a in sys.argv[1:]:
    if a.startswith("--batch="):
        B = int(a.split("=")[1])
M, NC, SZ, K = 300, 10, 640, 8

model = TAMTRModel.from_yaml("tamtr.yaml", nc=NC, max_gt=M, remat=True,
                             dtype=jnp.bfloat16)
cfg = TrainConfig(batch_size=B, warmup_iters=100, epochs=10, accumulate=1)
state, tx = create_train_state(
    model, jax.random.PRNGKey(0), cfg, (B, SZ, SZ, 3), NC,
    steps_per_epoch=100, max_gt=M,
)
step_fn = make_train_step(model, tx, DETRLossConfig(nc=NC), cfg)
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
    def body(carry, _):
        st, k = carry
        k, sub = jax.random.split(k)
        st, m = step_fn(st, batch, sub)
        return (st, k), m["loss"]

    (state, _), losses = jax.lax.scan(body, (state, key), None, length=K)
    return state, losses


state, losses = chained(state, batch, jax.random.PRNGKey(1))
assert np.isfinite(float(losses[-1]))
t0 = time.time()
state, losses = chained(state, batch, jax.random.PRNGKey(2))
_ = float(losses[-1])
print(f"steady: {(time.time() - t0) / K * 1000:.1f} ms/step (b{B} bf16)")

out_dir = "/tmp/trace_train"
with jax.profiler.trace(out_dir):
    state, losses = chained(state, batch, jax.random.PRNGKey(3))
    _ = float(losses[-1])

files = glob.glob(out_dir + "/**/*.trace.json.gz", recursive=True)
ev = json.load(gzip.open(sorted(files)[-1]))
cat = defaultdict(float)
byop = defaultdict(lambda: [0.0, 0])
for e in ev.get("traceEvents", []):
    if e.get("ph") != "X":
        continue
    args = e.get("args", {})
    if not args or "hlo_category" not in args:
        continue
    c = args["hlo_category"]
    if c == "while":
        continue
    dur = e.get("dur", 0) / 1000.0
    cat[c] += dur
    byop[(c, e.get("name", "")[:36])][0] += dur
    byop[(c, e.get("name", "")[:36])][1] += 1
print("=== by category (ms/step):")
for c, ms in sorted(cat.items(), key=lambda kv: -kv[1]):
    print(f"{ms/K:9.2f}  {c}")
print("=== top ops:")
for (c, n), (ms, cnt) in sorted(byop.items(), key=lambda kv: -kv[1][0])[:30]:
    print(f"{ms/K:9.3f} x{cnt:5d}  {c:22s} {n}")
