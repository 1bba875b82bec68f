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

Quantization flags (reference `engine/exporter.py` `half`/`int8` columns of
the format matrix, `cfg/default.yaml` half/int8):
- half=True  : orbax/npz cast float weights to bfloat16 (half-size
               artifacts, the analogue of the reference's `.half()` strip);
               tflite applies float16 post-training quantization.
- int8=True  : tflite full-integer post-training quantization with a
               representative dataset (pass `calib=` an iterable of
               (img, txt) float batches — reference calibrates on dataset
               images, `exporter.py` tflite row); float32 I/O is kept so
               AutoBackend runs quantized artifacts unchanged.
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
    half: bool = False,
    int8: bool = False,
    calib=None,
) -> Path:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if int8 and fmt != "tflite":
        raise ValueError(
            "int8 post-training quantization is a tflite-only flag "
            f"(reference format matrix); got fmt={fmt!r}"
        )
    if half and fmt in ("orbax", "npz"):
        # weight-halving analogue of the reference's `.half()` strip. orbax
        # stores bf16 natively; npz uses numpy-native float16 (np.save cannot
        # serialize ml_dtypes bfloat16) — AutoBackend upcasts on load.
        half_t = jnp.bfloat16 if fmt == "orbax" else jnp.float16
        variables = jax.tree.map(
            lambda x: x.astype(half_t)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            variables,
        )
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

        if half:  # bf16 weight constants in the serialized program
            variables = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                variables,
            )

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

        if half and fmt in ("savedmodel", "pb"):
            # half-size artifact: bf16 weight constants (computation
            # promotes back to f32 per JAX type rules)
            variables = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                variables,
            )

        def infer(img, txt):
            return model.apply(variables, img, txt, None, False)["pred"]

        tf_fn = tf.function(
            jax2tf.convert(infer, with_gradient=False),
            input_signature=[
                tf.TensorSpec([batch, imgsz, imgsz, 3], tf.float32, name="img"),
                tf.TensorSpec([batch, n_text, 512], tf.float32, name="txt"),
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
        if int8:
            # full-integer post-training quantization (reference tflite row
            # with int8=True, `engine/exporter.py`): calibrate activation
            # ranges on representative batches; keep float32 I/O so the
            # artifact runs through AutoBackend unchanged
            converter.optimizations = [tf.lite.Optimize.DEFAULT]

            # dict-keyed samples: the converter's positional input order is
            # NOT the signature order (the calibrator would feed the text
            # tensor to the image input and fail op Prepare)
            def _rep():
                if calib is not None:
                    for img, txt in calib:
                        yield {
                            "img": np.asarray(img, np.float32),
                            "txt": np.asarray(txt, np.float32),
                        }
                else:  # uncalibrated fallback: random images (smoke only)
                    rng = np.random.default_rng(0)
                    for _ in range(8):
                        yield {
                            "img": rng.random((batch, imgsz, imgsz, 3), np.float32),
                            "txt": rng.standard_normal(
                                (batch, n_text, 512)
                            ).astype(np.float32),
                        }

            converter.representative_dataset = _rep
            converter.target_spec.supported_ops = [
                tf.lite.OpsSet.TFLITE_BUILTINS_INT8,
                tf.lite.OpsSet.TFLITE_BUILTINS,  # fall back for un-quantizable ops
            ]
        elif half:
            # float16 post-training quantization (reference tflite half flag)
            converter.optimizations = [tf.lite.Optimize.DEFAULT]
            converter.target_spec.supported_types = [tf.float16]
        tfl = converter.convert()
        suffix = "_int8" if int8 else "_fp16" if half else ""
        path = out_dir / f"model{suffix}.tflite"
        path.write_bytes(tfl)
        return path
    raise ValueError(f"unknown export format {fmt!r}; valid: {FORMATS}")
