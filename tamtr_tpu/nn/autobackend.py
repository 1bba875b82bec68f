"""Unified multi-backend inference wrapper (reference `nn/autobackend.py`).

Backends:
- "jax"        : native — a TAMTRModel + orbax checkpoint or flat .npz
                 weight archive (fastest on TPU).
- "savedmodel" : TF SavedModel exported by `engine/exporter.py` (TF-serving
                 path; requires tensorflow).
- "tflite"     : TFLite flatbuffer via the tf.lite Interpreter (edge path).
- "stablehlo"  : serialized StableHLO program via `jax.export` (portable
                 PJRT artifact; no flax/python model code needed to run).

The reference's ONNX/TensorRT/OpenVINO/CoreML/ncnn/paddle backends are
GPU-vendor runtimes; the TPU serving story is jax or SavedModel, with TFLite
for edge targets.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Optional

import numpy as np


class AutoBackend:
    def __init__(
        self,
        weights: str | Path,
        model_cfg: str = "tamtr.yaml",
        nc: Optional[int] = None,
        imgsz: int = 640,
    ) -> None:
        self.imgsz = imgsz
        if isinstance(weights, str) and "://" in weights:
            # remote serving endpoint (reference `nn/autobackend.py` triton
            # row): weights = "http://host:port/<endpoint>"
            self.backend = "remote"
            from tamtr_tpu.serve import RemoteModel

            self._remote = RemoteModel(weights)
            self.nc = nc or self._remote.meta.get("nc")
            return
        p = Path(weights)
        if p.suffix == ".tflite":
            self.backend = "tflite"
            import tensorflow as tf

            self._interp = tf.lite.Interpreter(model_path=str(p))
            self._interp.allocate_tensors()
            self._in = self._interp.get_input_details()
            self._out = self._interp.get_output_details()
        elif p.suffix == ".stablehlo":
            self.backend = "stablehlo"
            import jax
            from jax import export as jax_export

            exported = jax_export.deserialize(p.read_bytes())
            self._fn = jax.jit(exported.call)
        elif p.suffix == ".pb":
            # frozen GraphDef from `export_model(fmt="pb")`: weights are
            # inlined constants; wrap the graph as a concrete function
            self.backend = "pb"
            import tensorflow as tf

            gd = tf.compat.v1.GraphDef()
            gd.ParseFromString(p.read_bytes())

            def _imports():
                tf.compat.v1.import_graph_def(gd, name="")

            wrapped = tf.compat.v1.wrap_function(_imports, [])
            graph = wrapped.graph
            ops = graph.get_operations()
            placeholders = [o.outputs[0] for o in ops if o.type == "Placeholder"]
            img_t = next(t for t in placeholders if len(t.shape) == 4)
            txt_t = next(t for t in placeholders if t is not img_t)
            # frozen concrete functions terminate in one Identity per output
            idents = [o for o in ops if o.type == "Identity"]
            out_t = (idents[-1] if idents else ops[-1]).outputs[0]
            self._fn = wrapped.prune([img_t, txt_t], [out_t])
        elif p.is_dir() and (p / "saved_model.pb").exists():
            self.backend = "savedmodel"
            import tensorflow as tf

            self._tf = tf.saved_model.load(str(p))
            self._fn = self._tf.f
        elif p.suffix == ".npz":
            # flat numpy archive from `export_model(fmt="npz")`: keys are
            # "/"-joined tree paths of the (EMA-resolved) variables
            self.backend = "jax"
            import jax
            import jax.numpy as jnp

            from tamtr_tpu.nn.graph import TAMTRModel

            assert nc, "npz archives carry no metadata; pass nc=..."
            data = np.load(p)
            variables: dict = {}
            for key in data.files:
                d = variables
                *parents, leaf = key.split("/")
                for q in parents:
                    d = d.setdefault(q, {})
                arr = data[key]
                if arr.dtype == np.float16:  # half export: upcast at load
                    arr = arr.astype(np.float32)
                d[leaf] = jnp.asarray(arr)
            self.model = TAMTRModel.from_yaml(model_cfg, nc=nc)
            # variables as jit ARGUMENTS (closure-captured weight trees are
            # baked into the HLO as literal constants — bloats the program
            # past remote-compile request limits on serving runtimes)
            jit_fn = jax.jit(
                lambda v, img, txt: self.model.apply(v, img, txt, None, False)["pred"]
            )
            self._fn = lambda img, txt, _v=variables: jit_fn(_v, img, txt)
        else:
            self.backend = "jax"
            import jax

            from tamtr_tpu.engine.checkpoint import load_checkpoint_raw
            from tamtr_tpu.nn.graph import TAMTRModel

            state, meta = load_checkpoint_raw(p)
            nc = nc or meta.get("nc")
            assert nc, "pass nc=... for checkpoints without metadata"
            self.model = TAMTRModel.from_yaml(
                meta.get("model_cfg", model_cfg), nc=nc, max_gt=meta.get("max_gt", 128)
            )
            variables = {"params": state.ema_params, "batch_stats": state.ema_batch_stats}
            pp = variables["params"]
            if hasattr(pp, "ndim") and pp.ndim == 1:  # flat checkpoint
                from tamtr_tpu.train.trainer import unravel_for_model

                variables["params"] = unravel_for_model(self.model, nc)(pp)
            jit_fn = jax.jit(
                lambda v, img, txt: self.model.apply(v, img, txt, None, False)["pred"]
            )
            self._fn = lambda img, txt, _v=variables: jit_fn(_v, img, txt)
        self.nc = nc

    def __call__(self, img: np.ndarray, txt_feats: np.ndarray) -> np.ndarray:
        """img (B, H, W, 3) float32 [0,1]; txt (B, K, 512) -> (B, nq, 4+nc)."""
        if self.backend == "remote":
            return self._remote(img, txt_feats)[0]
        if self.backend == "tflite":
            # select inputs by shape signature (rank-4 = image, rank-3 with
            # 512-last-dim = text) — size ordering can swap them when the
            # text tensor outgrows a small image
            img_in = next((d for d in self._in if len(d["shape"]) == 4), None)
            txt_in = next(
                (d for d in self._in if len(d["shape"]) == 3 and d is not img_in), None
            )
            if img_in is None or txt_in is None:  # fallback: export order
                img_in, txt_in = self._in[0], self._in[1]
            self._interp.set_tensor(img_in["index"], img.astype(np.float32))
            self._interp.set_tensor(txt_in["index"], txt_feats.astype(np.float32))
            self._interp.invoke()
            return self._interp.get_tensor(self._out[0]["index"])
        if self.backend in ("savedmodel", "pb"):
            import tensorflow as tf

            out = self._fn(tf.constant(img), tf.constant(txt_feats))
            if isinstance(out, (list, tuple)):
                out = out[0]
            return out.numpy()
        import jax

        return np.asarray(jax.device_get(self._fn(img, txt_feats)))

    def warmup(self, batch: int = 1, n_text: int = 10) -> None:
        img = np.zeros((batch, self.imgsz, self.imgsz, 3), np.float32)
        txt = np.zeros((batch, n_text, 512), np.float32)
        self(img, txt)
