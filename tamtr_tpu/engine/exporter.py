"""Model export (the reference's 12-format `Exporter`, TPU-native analogue).

Formats:
- "orbax"       : native checkpoint (weights only) — always available.
- "savedmodel"  : TF SavedModel via jax2tf (serving path) — requires
                  tensorflow; gated.
- "tflite"      : TFLite via the SavedModel converter — gated on TF.
- "npz"         : flat numpy weight archive (interchange / inspection).
- "stablehlo"   : serialized StableHLO program via `jax.export` — the
                  TPU-native portable artifact (any PJRT runtime can load
                  it); always available.
- "onnx"        : SavedModel -> ONNX via tf2onnx — gated (tf2onnx is not
                  in this image; documented reference parity hook,
                  reference `engine/exporter.py:79` format matrix).
- "pb"          : frozen TF GraphDef (weights inlined as constants) — the
                  reference's 'pb' format row; gated on TF.

The reference's TensorRT/CoreML/ncnn/Paddle targets are GPU/mobile
runtimes with no TPU-serving role; SavedModel is the canonical TF-serving
format for TPU deployments and StableHLO the PJRT-portable one.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

FORMATS = ("orbax", "savedmodel", "tflite", "npz", "stablehlo", "onnx", "pb")


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
    if fmt == "stablehlo":
        from jax import export as jax_export

        def infer(img, txt):
            return model.apply(variables, img, txt, None, False)["pred"]

        exported = jax_export.export(jax.jit(infer))(
            jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), jnp.float32),
            jax.ShapeDtypeStruct((batch, n_text, 512), jnp.float32),
        )
        path = out_dir / "model.stablehlo"
        path.write_bytes(exported.serialize())
        return path
    if fmt in ("savedmodel", "tflite", "onnx", "pb"):
        try:
            import tensorflow as tf
            from jax.experimental import jax2tf
        except ImportError as e:
            raise RuntimeError(
                f"{fmt} export requires tensorflow (not installed in this image): {e}"
            )
        if fmt == "onnx":
            try:
                import tf2onnx  # noqa: F401
            except ImportError as e:
                raise RuntimeError(
                    "onnx export requires tf2onnx (not installed in this "
                    f"image); export 'savedmodel' and convert offline: {e}"
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
        if fmt == "pb":
            # frozen GraphDef (reference `export_formats()` 'pb' row): inline
            # the weights as constants and serialize the single graph
            from tensorflow.python.framework.convert_to_constants import (
                convert_variables_to_constants_v2,
            )

            frozen = convert_variables_to_constants_v2(
                tf_fn.get_concrete_function()
            )
            path = out_dir / "model.pb"
            tf.io.write_graph(
                frozen.graph.as_graph_def(), str(out_dir), "model.pb", as_text=False
            )
            return path
        module = tf.Module()
        module.f = tf_fn
        sm_path = out_dir / "saved_model"
        tf.saved_model.save(module, str(sm_path))
        if fmt == "savedmodel":
            return sm_path
        if fmt == "onnx":
            import tf2onnx

            path = out_dir / "model.onnx"
            tf2onnx.convert.from_saved_model(str(sm_path), output_path=str(path))
            return path
        converter = tf.lite.TFLiteConverter.from_saved_model(str(sm_path))
        tfl = converter.convert()
        path = out_dir / "model.tflite"
        path.write_bytes(tfl)
        return path
    raise ValueError(f"unknown export format {fmt!r}; valid: {FORMATS}")
