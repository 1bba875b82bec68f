"""SAM predictor: promptable + automatic ("segment everything") inference.

TPU-native equivalent of the reference `ultralytics/models/sam/predict.py`.
Design differences from the torch version, chosen for XLA:

- The image encoder and the (prompt-encode + mask-decode) step are two
  separately jitted functions; `set_image` caches the encoded features so
  repeated prompts on one image only run the cheap decoder.
- Prompt counts are padded up to power-of-two buckets so each bucket
  compiles once (XLA needs static shapes); padded slots are dropped on host.
- In `generate`, quality/stability filtering and mask->box run at the
  decoder's low resolution (4x the embedding grid, e.g. 256x256 for a
  1024px model) fused on-device; only surviving masks are upscaled on host.
  The reference instead interpolates every candidate mask to full
  resolution before filtering (`predict.py:258-269`) — same selection
  semantics, a fraction of the HBM traffic.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tamtr_tpu.engine.results import Results
from tamtr_tpu.models.sam import amg
from tamtr_tpu.models.sam.build import PIXEL_MEAN, PIXEL_STD, SamModel, build_sam


def _bucket(n: int, cap: int = 64) -> int:
    b = 1
    while b < n and b < cap:
        b *= 2
    return b


def _nms_numpy(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float) -> np.ndarray:
    """Greedy NMS on host (small N; the device path is `tamtr_tpu.ops.nms`)."""
    if len(boxes) == 0:
        return np.zeros((0,), np.int64)
    x1, y1, x2, y2 = boxes.T
    areas = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        iou = inter / (areas[i] + areas[order[1:]] - inter + 1e-9)
        order = order[1:][iou <= iou_thresh]
    return np.asarray(keep, np.int64)


class SAMPredictor:
    """Promptable segmentation predictor (reference `sam/predict.py:27-463`)."""

    def __init__(
        self,
        model: Any = "mobile_sam",
        imgsz: int = 1024,
        conf: float = 0.88,
        iou: float = 0.7,
        seed: int = 0,
    ) -> None:
        self.sam: SamModel = model if isinstance(model, SamModel) else build_sam(model)
        if self.sam.variables is None:
            self.sam.init(jax.random.PRNGKey(seed))
        self.imgsz = self.sam.img_size
        self.conf = conf
        self.iou = iou
        self.mean = np.asarray(PIXEL_MEAN, np.float32)
        self.std = np.asarray(PIXEL_STD, np.float32)
        self.im: Optional[np.ndarray] = None  # preprocessed (1, S, S, 3)
        self.features: Optional[jnp.ndarray] = None
        self.prompts: Dict[str, Any] = {}
        self.segment_all = False
        self._src_shape: Optional[Tuple[int, int]] = None  # original (h, w)
        self._ratio: float = 1.0
        self._jit_cache: Dict[Any, Any] = {}

    # ------------------------------------------------------------------ jit
    def _encode_fn(self):
        # variables are jit ARGUMENTS, not closure captures: captured weight
        # trees are baked into the HLO as literal constants, which bloats the
        # program past remote-compile request limits (HTTP 413 on the axon
        # serving runtime for ViT-B's ~91M params) and recompiles on update
        if "encode" not in self._jit_cache:
            enc = self.sam.image_encoder
            fn = jax.jit(lambda v, img: enc.apply(v, img))
            v = self.sam.variables["image_encoder"]
            self._jit_cache["encode"] = lambda img: fn(v, img)
        return self._jit_cache["encode"]

    def _decode_fn(self, has_points: bool, has_boxes: bool, has_masks: bool):
        key = ("decode", has_points, has_boxes, has_masks)
        if key not in self._jit_cache:
            pe_mod = self.sam.prompt_encoder
            dec_mod = self.sam.mask_decoder

            @jax.jit
            def run(pe_vars, dec_vars, features, coords, labels, boxes, masks):
                points = (coords, labels) if has_points else None
                sparse, dense = pe_mod.apply(
                    pe_vars,
                    points=points,
                    boxes=boxes if has_boxes else None,
                    masks=masks if has_masks else None,
                )
                dense_pe = pe_mod.apply(pe_vars, method=pe_mod.get_dense_pe)
                lowres, iou_pred = dec_mod.apply(dec_vars, features, dense_pe, sparse, dense)
                return lowres, iou_pred

            pe_v = self.sam.variables["prompt_encoder"]
            dec_v = self.sam.variables["mask_decoder"]
            self._jit_cache[key] = lambda features, coords, labels, boxes, masks: run(
                pe_v, dec_v, features, coords, labels, boxes, masks
            )
        return self._jit_cache[key]

    # ------------------------------------------------------------ image I/O
    def preprocess(self, img_bgr: np.ndarray) -> np.ndarray:
        """Top-left letterbox to (S, S), RGB, (x-mean)/std (reference :69-112)."""
        h, w = img_bgr.shape[:2]
        r = min(self.imgsz / h, self.imgsz / w)
        nh, nw = round(h * r), round(w * r)
        import cv2

        resized = cv2.resize(img_bgr, (nw, nh), interpolation=cv2.INTER_LINEAR)
        canvas = np.full((self.imgsz, self.imgsz, 3), 114, np.uint8)
        canvas[:nh, :nw] = resized
        rgb = canvas[..., ::-1].astype(np.float32)
        self._src_shape, self._ratio = (h, w), r
        return ((rgb - self.mean) / self.std)[None]

    def set_image(self, image: Any) -> None:
        """Encode one image and cache its features (reference :390-412)."""
        from tamtr_tpu.data.loaders import load_inference_source

        name, frame = next(load_inference_source(image))
        self._img_path = name
        self.im = self.preprocess(frame)
        self.features = self._encode_fn()(jnp.asarray(self.im))

    def reset_image(self) -> None:
        self.im = None
        self.features = None

    def set_prompts(self, prompts: Dict[str, Any]) -> None:
        self.prompts = prompts

    # -------------------------------------------------------------- prompts
    def prompt_inference(
        self,
        bboxes: Optional[np.ndarray] = None,
        points: Optional[np.ndarray] = None,
        labels: Optional[np.ndarray] = None,
        masks: Optional[np.ndarray] = None,
        multimask_output: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Segment from prompts; returns (mask_logits (N, S, S') low-res, scores (N,)).

        Prompts are in ORIGINAL image pixel coords; scaled by the letterbox
        ratio like the reference (`predict.py:165-183`). Each box / point
        becomes its own prompt (one output mask per prompt).
        """
        assert self.features is not None, "call set_image() first"
        r = 1.0 if self.segment_all else self._ratio
        n_prompts = 0
        coords = lab = None
        if points is not None:
            pts = np.asarray(points, np.float32) * r
            pts = pts[None] if pts.ndim == 1 else pts
            if pts.ndim == 2:
                pts = pts[:, None, :]  # (N, 1, 2): one point per prompt
            lab = np.ones(pts.shape[:2], np.int32) if labels is None else np.asarray(
                labels, np.int32
            ).reshape(pts.shape[:2])
            coords = pts
            n_prompts = pts.shape[0]
        box_arr = None
        if bboxes is not None:
            box_arr = np.asarray(bboxes, np.float32) * r
            box_arr = box_arr[None] if box_arr.ndim == 1 else box_arr
            n_prompts = max(n_prompts, box_arr.shape[0])
        mask_arr = None
        if masks is not None:
            mask_arr = np.asarray(masks, np.float32)
            if mask_arr.ndim == 3:
                mask_arr = mask_arr[..., None]  # (N, h, w, 1)
            n_prompts = max(n_prompts, mask_arr.shape[0])

        # pad prompt batch to a bucket so each size compiles once
        B = _bucket(n_prompts)
        eh, ew = self.sam.embed_size

        def pad0(a, target):
            if a is None or a.shape[0] == target:
                return a
            reps = [(0, target - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, reps)

        coords_p = pad0(coords, B) if coords is not None else np.zeros((B, 1, 2), np.float32)
        lab_p = pad0(lab, B) if lab is not None else -np.ones((B, 1), np.int32)
        box_p = pad0(box_arr, B) if box_arr is not None else np.zeros((B, 4), np.float32)
        mask_p = (
            pad0(mask_arr, B)
            if mask_arr is not None
            else np.zeros((B, 4 * eh, 4 * ew, 1), np.float32)
        )

        run = self._decode_fn(coords is not None, box_arr is not None, mask_arr is not None)
        lowres, iou_pred = run(
            self.features,
            jnp.asarray(coords_p),
            jnp.asarray(lab_p),
            jnp.asarray(box_p),
            jnp.asarray(mask_p),
        )
        sl = slice(1, None) if multimask_output else slice(0, 1)
        lowres = np.asarray(lowres[:, sl])[:n_prompts]
        scores = np.asarray(iou_pred[:, sl])[:n_prompts]
        # (N, d, h, w) -> (N*d, h, w)
        return lowres.reshape(-1, *lowres.shape[2:]), scores.reshape(-1)

    # ------------------------------------------------------------- generate
    def generate(
        self,
        im: Optional[np.ndarray] = None,
        crop_n_layers: int = 0,
        crop_overlap_ratio: float = 512 / 1500,
        crop_downscale_factor: int = 1,
        point_grids: Optional[List[np.ndarray]] = None,
        points_stride: int = 32,
        points_batch_size: int = 64,
        conf_thres: float = 0.88,
        stability_score_thresh: float = 0.95,
        stability_score_offset: float = 0.95,
        crop_nms_thresh: float = 0.7,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Segment everything (reference `predict.py:202-303`).

        Returns (masks (N, S, S) bool at model-input res, scores (N,),
        boxes (N, 4) xyxy at model-input res).
        """
        import cv2

        self.segment_all = True
        assert self.im is not None, "call set_image() first"
        S = self.imgsz
        canvas_u8 = None  # re-derive uint8 for crop re-encoding when needed
        crop_regions, layer_idxs = amg.generate_crop_boxes((S, S), crop_n_layers, crop_overlap_ratio)
        if point_grids is None:
            point_grids = amg.build_all_layer_point_grids(
                points_stride, crop_n_layers, crop_downscale_factor
            )

        all_masks, all_scores, all_boxes, region_areas = [], [], [], []
        for crop_region, layer_idx in zip(crop_regions, layer_idxs):
            x1, y1, x2, y2 = crop_region
            w, h = x2 - x1, y2 - y1
            if (x1, y1, x2, y2) == (0, 0, S, S):
                feats = self.features if self.features is not None else self._encode_fn()(
                    jnp.asarray(self.im)
                )
                self.features = feats
                saved_feats = None
            else:
                # re-encode the upscaled crop (reference :251)
                if canvas_u8 is None:
                    canvas_u8 = (self.im[0] * self.std + self.mean).astype(np.float32)
                crop = canvas_u8[y1:y2, x1:x2]
                crop = cv2.resize(crop, (S, S), interpolation=cv2.INTER_LINEAR)
                saved_feats = self.features
                self.features = self._encode_fn()(
                    jnp.asarray(((crop - self.mean) / self.std)[None])
                )
            points_for_image = point_grids[layer_idx] * np.array([[w, h]], np.float32)

            crop_masks, crop_scores = [], []
            for (pts,) in amg.batch_iterator(points_batch_size, points_for_image):
                lowres, score = self.prompt_inference(points=pts, multimask_output=True)
                keep = score > conf_thres
                lowres, score = lowres[keep], score[keep]
                if len(lowres) == 0:
                    continue
                stability = np.asarray(
                    amg.calculate_stability_score(
                        jnp.asarray(lowres), self.sam.mask_threshold, stability_score_offset
                    )
                )
                keep = stability > stability_score_thresh
                lowres, score = lowres[keep], score[keep]
                if len(lowres) == 0:
                    continue
                crop_masks.append(lowres > self.sam.mask_threshold)
                crop_scores.append(score)
            if not crop_masks:
                if saved_feats is not None:
                    self.features = saved_feats
                continue
            masks_lr = np.concatenate(crop_masks)  # (n, hl, wl) bool at low res
            scores = np.concatenate(crop_scores)
            # boxes at low res -> crop pixel scale
            boxes_lr = np.asarray(amg.batched_mask_to_box(jnp.asarray(masks_lr)), np.float32)
            hl, wl = masks_lr.shape[-2:]
            boxes_px = boxes_lr * np.array([w / wl, h / hl, w / wl, h / hl], np.float32)
            edge = amg.is_box_near_crop_edge(boxes_px, crop_region, [0, 0, S, S])
            masks_lr, boxes_px, scores = masks_lr[~edge], boxes_px[~edge], scores[~edge]
            if len(masks_lr) == 0:
                if saved_feats is not None:
                    self.features = saved_feats
                continue
            keep = _nms_numpy(boxes_px, scores, self.iou)
            masks_lr, boxes_px, scores = masks_lr[keep], boxes_px[keep], scores[keep]

            # upscale survivors to crop size, place into full-image canvas
            for m, b, s in zip(masks_lr, boxes_px, scores):
                up = cv2.resize(m.astype(np.uint8), (w, h), interpolation=cv2.INTER_LINEAR)
                full = np.zeros((S, S), bool)
                full[y1:y2, x1:x2] = up.astype(bool)
                all_masks.append(full)
                all_boxes.append(b + np.array([x1, y1, x1, y1], np.float32))
                all_scores.append(float(s))
                region_areas.append(float(w * h))
            if saved_feats is not None:
                self.features = saved_feats

        if not all_masks:
            return np.zeros((0, S, S), bool), np.zeros((0,)), np.zeros((0, 4), np.float32)
        masks = np.stack(all_masks)
        boxes = np.stack(all_boxes)
        scores = np.asarray(all_scores, np.float32)
        if len(crop_regions) > 1:
            # prefer masks from smaller crops (reference :298-301)
            keep = _nms_numpy(boxes, 1.0 / np.asarray(region_areas, np.float32), crop_nms_thresh)
            masks, boxes, scores = masks[keep], boxes[keep], scores[keep]
        return masks, scores, boxes

    # ----------------------------------------------------------- full runs
    def __call__(
        self,
        source: Any = None,
        bboxes=None,
        points=None,
        labels=None,
        masks=None,
        multimask_output: bool = False,
        **generate_kwargs: Any,
    ) -> List[Results]:
        """Run promptable (if any prompt given) or automatic segmentation."""
        bboxes = self.prompts.pop("bboxes", bboxes)
        points = self.prompts.pop("points", points)
        masks = self.prompts.pop("masks", masks)
        results: List[Results] = []
        from tamtr_tpu.data.loaders import load_inference_source

        for name, frame in load_inference_source(source) if source is not None else [
            (getattr(self, "_img_path", "image"), None)
        ]:
            if frame is not None:
                self.im = self.preprocess(frame)
                self._img_path = name
                self.features = self._encode_fn()(jnp.asarray(self.im))
            if bboxes is None and points is None and masks is None:
                m, s, b = self.generate(**generate_kwargs)
                results.append(self._to_results(name, m, s, b))
            else:
                lowres, score = self.prompt_inference(
                    bboxes, points, labels, masks, multimask_output
                )
                m_full = self._upscale_masks(lowres)
                b = np.asarray(
                    amg.batched_mask_to_box(jnp.asarray(m_full)), np.float32
                )
                results.append(self._to_results(name, m_full, score, b))
            self.segment_all = False
        return results

    def _upscale_masks(self, lowres: np.ndarray) -> np.ndarray:
        """Low-res logits -> bool masks at model-input resolution."""
        import cv2

        S = self.imgsz
        out = np.zeros((len(lowres), S, S), bool)
        for i, m in enumerate(lowres):
            up = cv2.resize(m.astype(np.float32), (S, S), interpolation=cv2.INTER_LINEAR)
            out[i] = up > self.sam.mask_threshold
        return out

    def _to_results(self, path: str, masks: np.ndarray, scores: np.ndarray, boxes: np.ndarray) -> Results:
        """Rescale masks/boxes from model-input to original image space."""
        import cv2

        oh, ow = self._src_shape if self._src_shape else (self.imgsz, self.imgsz)
        r = self._ratio
        nh, nw = round(oh * r), round(ow * r)
        out_masks = np.zeros((len(masks), oh, ow), bool)
        for i, m in enumerate(masks):
            valid = m[:nh, :nw].astype(np.uint8)
            out_masks[i] = cv2.resize(valid, (ow, oh), interpolation=cv2.INTER_LINEAR).astype(bool)
        out_boxes = boxes / r
        out_boxes[:, [0, 2]] = out_boxes[:, [0, 2]].clip(0, ow)
        out_boxes[:, [1, 3]] = out_boxes[:, [1, 3]].clip(0, oh)
        names = [str(i) for i in range(len(masks))]
        return Results(
            path=path,
            boxes=out_boxes,
            scores=np.asarray(scores, np.float32),
            labels=np.arange(len(masks)),
            names=names,
            orig_shape=(oh, ow),
            masks=out_masks.astype(np.float32),
        )

    @staticmethod
    def remove_small_regions(
        masks: np.ndarray, min_area: int = 0, nms_thresh: float = 0.7
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Fill holes / drop islands below min_area, then NMS (reference :423-463)."""
        if len(masks) == 0:
            return masks, np.zeros((0,), np.int64)
        new_masks, scores = [], []
        for mask in masks:
            m = mask.astype(np.uint8)
            m, changed = amg.remove_small_regions(m, min_area, mode="holes")
            unchanged = not changed
            m, changed = amg.remove_small_regions(m, min_area, mode="islands")
            unchanged = unchanged and not changed
            new_masks.append(m)
            scores.append(float(unchanged))
        new_masks = np.stack(new_masks)
        boxes = np.asarray(amg.batched_mask_to_box(jnp.asarray(new_masks)), np.float32)
        keep = _nms_numpy(boxes, np.asarray(scores, np.float32), nms_thresh)
        return new_masks[keep], keep
