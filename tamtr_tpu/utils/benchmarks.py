"""Benchmark harness (reference `utils/benchmarks.py`): export-format sweep +
inference timing for a trained model.

`benchmark(engine)` exports to each available format, loads each exported
artifact back through AutoBackend, and asserts PREDICTION PARITY with the
native jax path on a fixed batch (the reference's benchmark() vals every
exported format and asserts an mAP floor, `utils/benchmarks.py:45-152` —
here prediction parity is the stronger, dataset-free equivalent). Returns a
table of {format, ok, parity_ok, parity_maxdiff, img_per_sec}.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np


def benchmark(
    engine,
    imgsz: int = 640,
    batch: int = 1,
    formats: Optional[List[str]] = None,
    out_dir: str = "runs/benchmark",
    n_iter: int = 10,
) -> List[Dict[str, Any]]:
    import jax

    from tamtr_tpu.engine.exporter import FORMATS, export_model

    formats = formats or list(FORMATS)
    assert engine.model is not None and engine.state is not None
    variables = engine._variables_from(engine.state)
    n_text = max(len(engine.names), 1)
    rows: List[Dict[str, Any]] = []

    # native jax timing first (the deployment path); its predictions are the
    # parity oracle for every exported format below
    fwd = jax.jit(lambda img, txt: engine.model.apply(variables, img, txt, None, False)["pred"])
    img = np.random.default_rng(0).random((batch, imgsz, imgsz, 3), dtype=np.float32)
    txt = np.zeros((batch, n_text, 512), np.float32)
    native = np.asarray(jax.device_get(fwd(img, txt)))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        jax.device_get(fwd(img, txt))
    dt = (time.perf_counter() - t0) / n_iter
    rows.append({"format": "jax", "ok": True, "parity_ok": True,
                 "img_per_sec": round(batch / dt, 2)})

    from tamtr_tpu.nn.autobackend import AutoBackend

    nc = len(engine.names) or engine.model.nc
    for fmt in formats:
        row: Dict[str, Any] = {"format": fmt}
        try:
            path = export_model(
                engine.model, variables, imgsz, n_text, Path(out_dir) / fmt, fmt, batch
            )
            row.update(ok=True, path=str(path))
        except Exception as e:  # gated formats (e.g. TF missing)
            rows.append({"format": fmt, "ok": False, "error": str(e)[:120]})
            continue
        # export success alone is NOT a pass: load the artifact back and
        # compare predictions with the native path (boxes+scores both live
        # in [0, 1]; tflite may run reduced precision — tolerance covers it)
        try:
            backend = AutoBackend(path, model_cfg=engine.model_cfg, nc=nc, imgsz=imgsz)
            pred = np.asarray(backend(img, txt))
            maxdiff = float(np.abs(pred - native).max())
            row["parity_maxdiff"] = round(maxdiff, 6)
            row["parity_ok"] = bool(pred.shape == native.shape and maxdiff < 5e-3)
            t0 = time.perf_counter()
            for _ in range(max(n_iter // 2, 1)):
                backend(img, txt)
            row["img_per_sec"] = round(
                batch * max(n_iter // 2, 1) / (time.perf_counter() - t0), 2
            )
        except Exception as e:
            row["parity_ok"] = False
            row["parity_error"] = str(e)[:120]
        rows.append(row)
    return rows


def profile_model(
    engine,
    imgsz_list: Optional[List[int]] = None,
    batch: int = 1,
    n_iter: int = 8,
) -> List[Dict[str, Any]]:
    """Per-size timing + FLOPs sweep (reference `ProfileModels`,
    `utils/benchmarks.py:153`). Uses chained iterations to amortize the
    dispatch round-trip and XLA cost analysis for FLOPs."""
    import jax
    import jax.numpy as jnp

    assert engine.model is not None and engine.state is not None
    variables = engine._variables_from(engine.state)
    n_text = max(len(engine.names), 1)
    rows: List[Dict[str, Any]] = []
    for sz in imgsz_list or [320, 640]:
        txt = jnp.zeros((batch, n_text, 512), jnp.float32)

        # variables as jit arguments: closure-captured weight trees become
        # HLO literal constants (huge programs, remote-compile 413s)
        def fwd(v, img):
            return engine.model.apply(v, img, txt, None, False)["pred"]

        @jax.jit
        def chained_v(v, img):
            def body(c, _):
                p = fwd(v, c)
                return jnp.clip(c + jnp.tanh(p.mean()) * 1e-3, 0, 1), None

            out, _ = jax.lax.scan(body, img, None, length=n_iter)
            return out

        chained = lambda img: chained_v(variables, img)

        img = jnp.asarray(
            np.random.default_rng(0).random((batch, sz, sz, 3), dtype=np.float32)
        )
        try:
            cost = jax.jit(fwd).lower(variables, img).compile().cost_analysis()
            flops = float(cost.get("flops", 0.0)) if cost else 0.0
        except Exception:
            flops = 0.0
        jax.device_get(chained(img)[0, 0, :2])
        t0 = time.perf_counter()
        jax.device_get(chained(img)[0, 0, :2])
        dt = (time.perf_counter() - t0) / n_iter
        rows.append(
            {
                "imgsz": sz,
                "ms_per_image": round(dt * 1e3 / batch, 2),
                "img_per_sec": round(batch / dt, 1),
                "gflops_per_image": round(flops / 1e9 / batch, 1),
            }
        )
    return rows
