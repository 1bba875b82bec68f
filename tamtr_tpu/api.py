"""Public model facades.

The reference exposes one facade class per model family
(`ultralytics/__init__.py`: `RTDETRWorld`, `YOLO`, `RTDETR`, `SAM`,
`FastSAM`, `NAS`); each routes train/val/predict/export through `task_map`.
Here every detection-family facade shares the one JAX `Engine` (the model
graph comes from the family's YAML), while `SAM`/`FastSAM` wrap the
promptable-segmentation predictors.
"""

from __future__ import annotations

from typing import Any, Optional


class TAMTR:
    """Text-guided multi-modal detector facade (reference `models/rtdetrworld/model.py`)."""

    def __init__(self, model: str = "tamtr.yaml", task: str = "detect") -> None:
        self.model_cfg = model
        self.task = task
        self._engine = None

    def _lazy_engine(self):
        if self._engine is None:
            from tamtr_tpu.engine.model import Engine

            self._engine = Engine(self.model_cfg)
        return self._engine

    def train(self, **kwargs: Any):
        return self._lazy_engine().train(**kwargs)

    def val(self, **kwargs: Any):
        return self._lazy_engine().val(**kwargs)

    def predict(self, source: Any = None, **kwargs: Any):
        return self._lazy_engine().predict(source, **kwargs)

    def track(self, source: Any = None, tracker: str = "bytetrack", persist: bool = False, **kwargs: Any):
        """Multi-object tracking over a video/stream (reference `Model.track`)."""
        return self._lazy_engine().track(source, tracker=tracker, persist=persist, **kwargs)

    def tune(self, iterations: int = 10, use_ray: bool = False, **kwargs: Any):
        """Hyperparameter search over short trainings: mutation evolution by
        default, Ray Tune + ASHA with use_ray=True (reference `Model.tune`)."""
        return self._lazy_engine().tune(iterations, use_ray=use_ray, **kwargs)

    def export(self, fmt: str = "orbax", **kwargs: Any):
        """Export weights (orbax / savedmodel via jax2tf / tflite / npz)."""
        return self._lazy_engine().export(fmt, **kwargs)

    def info(self, imgsz: int = 640, nc: int = 80) -> str:
        """Model summary: layers / params / GFLOPs (reference
        `BaseModel.info` -> `torch_utils.model_info`; FLOPs come from
        XLA's own cost analysis instead of thop)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from tamtr_tpu.nn.graph import TAMTRModel
        from tamtr_tpu.utils.profiler import flops_of

        eng = self._lazy_engine()
        model = eng.model or TAMTRModel.from_yaml(self.model_cfg, nc=nc)
        img = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
        # text dim = head hidden dim (contrastive heads dot text directly;
        # 512 = CLIP dim on the full model, smaller on nano/mid configs)
        hd = model.head_args[1] if len(model.head_args) > 1 else 512
        txt = jnp.zeros((1, model.nc, int(hd)), jnp.float32)
        rngs = {"params": jax.random.PRNGKey(0), "cdn": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(0)}
        variables = (
            eng._variables_from(eng.state)
            if eng.state is not None
            else jax.eval_shape(lambda: model.init(rngs, img, txt, None, False))
        )
        n_params = sum(
            int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables)
        )
        n_layers = len(model.specs) + 1  # graph layers + head
        cost = None
        if eng.state is not None:
            cost = flops_of(
                lambda v: model.apply(v, img, txt, None, False)["pred"], variables
            )
        gflops = f", {cost['gflops']:.1f} GFLOPs @ {imgsz}px" if cost else ""
        summary = (
            f"{type(self).__name__}({self.model_cfg}): {n_layers} layers, "
            f"{n_params / 1e6:.1f}M params{gflops}"
        )
        from tamtr_tpu.utils.log import LOGGER

        LOGGER.info(summary)
        return summary

    def load(self, weights: str, **kwargs: Any) -> "TAMTR":
        """Load a trained checkpoint for val/predict."""
        self._lazy_engine().load(weights, **kwargs)
        return self

    def set_classes(self, classes, embeddings=None):
        """Open-vocabulary retarget: supply class names (+ precomputed text embeddings)."""
        return self._lazy_engine().set_classes(classes, embeddings)


class YOLO(TAMTR):
    """YOLO detect/segment/pose/classify facade (reference `models/yolo/model.py`).

    The task is carried by the model YAML: `yolo-gelan.yaml` (detect),
    `yolo-seg-gelan.yaml` (segment), `yolo-pose-gelan.yaml` (pose),
    `classify-gelan.yaml` (classify).
    """

    def __init__(self, model: str = "yolo-gelan.yaml", task: Optional[str] = None) -> None:
        stem = str(model).lower()
        if task is None:
            if "seg" in stem:
                task = "segment"
            elif "pose" in stem:
                task = "pose"
            elif "classify" in stem or "cls" in stem:
                task = "classify"
            else:
                task = "detect"
        super().__init__(model, task)


class RTDETR(TAMTR):
    """Text-free RT-DETR facade (reference `models/rtdetr/model.py`)."""

    def __init__(self, model: str = "rtdetr.yaml") -> None:
        super().__init__(model, "detect")


class SAM:
    """Promptable Segment Anything facade (reference `models/sam/model.py`).

    Usage:
        sam = SAM("mobile_sam")          # or sam_b / sam_l / sam_h
        results = sam("img.jpg", bboxes=[x1, y1, x2, y2])
        results = sam("img.jpg", points=[[x, y]], labels=[1])
        results = sam("img.jpg")          # segment everything
    """

    def __init__(self, model: str = "mobile_sam") -> None:
        self.model_name = model
        self._predictor = None

    @property
    def predictor(self):
        if self._predictor is None:
            from tamtr_tpu.models.sam import SAMPredictor

            self._predictor = SAMPredictor(self.model_name)
        return self._predictor

    def __call__(self, source: Any = None, **kwargs: Any):
        return self.predict(source, **kwargs)

    def predict(self, source: Any = None, bboxes=None, points=None, labels=None, **kwargs: Any):
        """Run promptable (given prompts) or automatic segmentation."""
        return self.predictor(source, bboxes=bboxes, points=points, labels=labels, **kwargs)

    def info(self) -> str:
        """One-line model description (reference `SAM.info`)."""
        import jax

        p = self.predictor
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(p.sam.variables))
        return f"SAM({self.model_name}): {n_params / 1e6:.1f}M params, imgsz={p.imgsz}"

    @property
    def task_map(self):
        from tamtr_tpu.models.sam import SAMPredictor

        return {"segment": {"predictor": SAMPredictor}}


class FastSAM(YOLO):
    """FastSAM facade: YOLO-seg "segment everything" + prompt post-selection
    (reference `models/fastsam/model.py`). Predict returns all-instance masks;
    `prompt()` selects by box/point/text against a `Results`.
    """

    def __init__(self, model: str = "yolo-seg-gelan.yaml") -> None:
        super().__init__(model, task="segment")

    @staticmethod
    def prompt(result, bboxes=None, points=None, labels=None, texts=None, embed_fn=None):
        """Post-hoc prompt selection on a predict() result (reference `fastsam/prompt.py`)."""
        from tamtr_tpu.models.fastsam import FastSAMPrompt

        p = FastSAMPrompt(result)
        if bboxes is not None:
            return p.box_prompt(bboxes)
        if points is not None:
            return p.point_prompt(points, labels)
        if texts is not None:
            return p.text_prompt(texts, embed_fn=embed_fn)
        return p.everything()


class NAS:
    """Pretrained-weights-only detection facade (reference `models/nas/model.py`).

    The reference wraps super-gradients YOLO-NAS checkpoints for predict/val
    only (train is unsupported, YAML construction is rejected). The TPU
    equivalent wraps any trained tamtr_tpu detection checkpoint the same way.
    """

    def __init__(self, model: str = "yolo_nas.ckpt") -> None:
        from pathlib import Path

        assert Path(model).suffix not in (".yaml", ".yml"), (
            "NAS models only support pre-trained weights, not YAML configs."
        )
        self.weights = model
        self._engine = None

    def _lazy_engine(self):
        if self._engine is None:
            from tamtr_tpu.engine.model import Engine

            self._engine = Engine("yolo-gelan.yaml")
            self._engine.load(self.weights)
        return self._engine

    def predict(self, source: Any = None, **kwargs: Any):
        return self._lazy_engine().predict(source, **kwargs)

    def __call__(self, source: Any = None, **kwargs: Any):
        return self.predict(source, **kwargs)

    def val(self, **kwargs: Any):
        return self._lazy_engine().val(**kwargs)

    def train(self, **kwargs: Any):
        raise NotImplementedError("NAS models only support predict/val (reference parity).")

    def info(self) -> str:
        eng = self._lazy_engine()
        return f"NAS({self.weights}): nc={len(eng.names)}"


# Reference import-surface alias: `from ultralytics import RTDETRWorld`.
RTDETRWorld = TAMTR
