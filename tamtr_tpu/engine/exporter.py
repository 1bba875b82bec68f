"""Model export (the reference's 12-format `Exporter`, TPU-native analogue).

Formats:
- "orbax"       : native checkpoint (weights only) — always available.
- "savedmodel"  : TF SavedModel via jax2tf (serving path) — requires
                  tensorflow; gated.
- "tflite"      : TFLite via the SavedModel converter — gated on TF.
- "npz"         : flat numpy weight archive (interchange / inspection).

The reference's ONNX/TensorRT/CoreML/ncnn/Paddle targets are GPU/mobile
runtimes with no TPU-serving role; SavedModel is the canonical TF-serving
format for TPU deployments.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

FORMATS = ("orbax", "savedmodel", "tflite", "npz")


def export_model(
    model,
    variables: Dict[str, Any],
    imgsz: int,
    n_text: int,
    out_dir: str | Path,
    fmt: str = "orbax",
    batch: int = 1,
) -> Path:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if fmt == "orbax":
        import orbax.checkpoint as ocp

        path = (out_dir / "model_orbax").resolve()
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, variables, force=True)
        ckptr.wait_until_finished()
        return path
    if fmt == "npz":
        flat = jax.tree_util.tree_flatten_with_path(variables)[0]
        arrs = {
            "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(v)
            for path, v in flat
        }
        path = out_dir / "model.npz"
        np.savez_compressed(path, **arrs)
        return path
    if fmt in ("savedmodel", "tflite"):
        try:
            import tensorflow as tf
            from jax.experimental import jax2tf
        except ImportError as e:
            raise RuntimeError(
                f"{fmt} export requires tensorflow (not installed in this image): {e}"
            )

        def infer(img, txt):
            return model.apply(variables, img, txt, None, False)["pred"]

        tf_fn = tf.function(
            jax2tf.convert(infer, with_gradient=False),
            input_signature=[
                tf.TensorSpec([batch, imgsz, imgsz, 3], tf.float32),
                tf.TensorSpec([batch, n_text, 512], tf.float32),
            ],
            autograph=False,
        )
        module = tf.Module()
        module.f = tf_fn
        sm_path = out_dir / "saved_model"
        tf.saved_model.save(module, str(sm_path))
        if fmt == "savedmodel":
            return sm_path
        converter = tf.lite.TFLiteConverter.from_saved_model(str(sm_path))
        tfl = converter.convert()
        path = out_dir / "model.tflite"
        path.write_bytes(tfl)
        return path
    raise ValueError(f"unknown export format {fmt!r}; valid: {FORMATS}")
