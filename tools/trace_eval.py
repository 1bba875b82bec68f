"""Capture a profiler trace of the chained bf16 eval forward and attribute
device time by op category (the r4 NOTES.md methodology, reusable)."""
import glob, gzip, json, sys, time
from collections import defaultdict

import jax, jax.numpy as jnp, numpy as np

from tamtr_tpu.utils.jax_setup import setup_jax
setup_jax()
from tamtr_tpu.nn.graph import TAMTRModel

B = 4
dtype = jnp.bfloat16
fuse = "--fuse" in sys.argv
model = TAMTRModel.from_yaml("tamtr.yaml", nc=10, max_gt=16, dtype=dtype)
img = jnp.asarray(np.random.default_rng(0).random((B, 640, 640, 3), dtype=np.float32))
txt = jnp.zeros((B, 10, 512), jnp.float32)
variables = jax.jit(lambda k: model.init({"params": k, "cdn": k, "dropout": k}, img, txt, None, False))(jax.random.PRNGKey(0))
if fuse:
    from tamtr_tpu.nn.fuse import fuse_repconv_variables
    model = model.clone(deploy=True)
    variables = fuse_repconv_variables(jax.device_get(variables))

ITERS = 16
@jax.jit
def chained(variables, img, txt):
    def body(c, _):
        pred = model.apply(variables, c, txt, None, False)["pred"]
        bump = jnp.tanh(pred.astype(jnp.float32).mean()) * 1e-3
        return jnp.clip(c + bump, 0.0, 1.0), None
    out, _ = jax.lax.scan(body, img, None, length=ITERS)
    return out

jax.device_get(chained(variables, img, txt)[0, 0, :2])
t0 = time.time()
jax.device_get(chained(variables, img, txt)[0, 0, :2])
per_iter = (time.time() - t0) / ITERS * 1000
print(f"steady: {per_iter:.2f} ms/iter ({B/per_iter*1000:.1f} img/s)")

out_dir = "/tmp/trace_eval"
with jax.profiler.trace(out_dir):
    jax.device_get(chained(variables, img, txt)[0, 0, :2])

# attribute: parse the trace proto events
files = glob.glob(out_dir + "/**/*.trace.json.gz", recursive=True)
if not files:
    print("no trace json found:", glob.glob(out_dir + "/**/*", recursive=True)[:10])
    sys.exit(0)
ev = json.load(gzip.open(sorted(files)[-1]))
cat = defaultdict(float)
total = 0.0
for e in ev.get("traceEvents", []):
    if e.get("ph") != "X":
        continue
    name = e.get("name", "")
    pidname = e.get("pid")
    dur = e.get("dur", 0) / 1000.0  # us -> ms
    args = e.get("args", {})
    # keep only device-side XLA ops (TensorFlow Op / XLA Op rows)
    if not args or "long_name" not in args and "hlo_category" not in args:
        continue
    c = args.get("hlo_category", "?")
    cat[(c, name.split(".")[0][:40])] += dur
    total += dur
rows = sorted(cat.items(), key=lambda kv: -kv[1])
print(f"total attributed: {total:.1f} ms over {ITERS} iters = {total/ITERS:.2f} ms/iter")
for (c, n), ms in rows[:40]:
    print(f"{ms/ITERS:8.3f} ms/iter  {c:24s} {n}")
