"""VisDrone/YOLO-format detection dataset + fixed-shape batch loader.

Host pipeline re-design of the reference data layer (`data/base.py`,
`data/dataset.py`, `data/build.py`):

- YOLO label txts (cls cx cy w h, normalized) next to images
  (`images/` -> `labels/`), same path convention as the reference.
- Label verification + npz cache keyed by a file-list hash
  (reference `verify_image_label` + `.cache`, `data/dataset.py:43-135`).
- The TAM-TR train path stretches every image square (rect_mode=False) and
  applies mosaic(p)/perspective/HSV/flip; val is plain stretch (SURVEY A.3).
- Collation pads ground truth to `max_gt` with a validity mask — the
  static-shape contract the jit train step needs (SURVEY A.12) — instead of
  the reference's ragged concat.
- `build_loader` shards the global batch across processes for multi-host
  data parallelism (the DistributedSampler equivalent) and prefetches with
  a thread pool of workers.
"""

from __future__ import annotations

import hashlib
import math
import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from tamtr_tpu.data import augment as A
from tamtr_tpu.utils.patches import imread as _imread

IMG_EXTS = {".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp"}


@dataclass
class AugConfig:
    """Mirrors the reference hyp keys (`cfg/default.yaml:100-117`)."""

    mosaic: float = 0.0  # TAM-TR ships mosaic off
    mosaic_n: int = 4  # 4 or 9 tiles (reference Mosaic n=4|9)
    mixup: float = 0.0
    copy_paste: float = 0.3  # TAM-TR recipe default (`cfg/default.yaml:114`)
    degrees: float = 0.0
    translate: float = 0.1
    scale: float = 0.9
    shear: float = 0.0
    perspective: float = 0.0
    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    fliplr: float = 0.5
    flipud: float = 0.0


def _img2label_path(img_path: str) -> str:
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    p = Path(img_path)
    return str(p.parent.parent / "labels" / (p.stem + ".txt")) if sa in str(p) else str(
        p.with_suffix(".txt")
    ).replace(sa, sb)


class DetectionDataset:
    """Images + YOLO labels with normalized-xywh -> pixel-xyxy conversion."""

    def __init__(
        self,
        img_dir: str | Path | Sequence[str],
        imgsz: int = 640,
        augment: bool = False,
        aug: Optional[AugConfig] = None,
        cache_labels: bool = True,
        seed: int = 0,
        task: str = "detect",
        kpt_shape: Tuple[int, int] = (17, 3),
        class_texts: Optional[Sequence[Sequence[str]]] = None,
        random_text: bool = False,
        cache: "bool | str" = False,
        classes: Optional[Sequence[int]] = None,
        single_cls: bool = False,
    ) -> None:
        self.imgsz = imgsz
        self.augment = augment
        self.aug = aug or AugConfig()
        self.task = task  # "detect" | "segment" | "pose"
        self.kpt_shape = kpt_shape
        # per-class synonym lists (names split on "/", reference
        # `rtdetrworld/val.py:54-58`); enables RandomLoadText when training
        self.class_texts = [list(t) for t in class_texts] if class_texts else None
        self.random_text = random_text and self.class_texts is not None
        self.im_files = self._glob_images(img_dir)
        if not self.im_files:
            raise FileNotFoundError(f"no images found under {img_dir}")
        self.label_files = [_img2label_path(f) for f in self.im_files]
        self.labels = self._load_labels(cache_labels)
        self._update_labels(classes, single_cls)
        self._rng = np.random.default_rng(seed)
        self._mosaic_on = self.aug.mosaic > 0
        # decoded-image cache (reference `BaseDataset.load_image` cache=ram|disk,
        # `data/base.py:144-220` incl. the RAM-fit check): JPEG decode is the
        # hottest host-pipeline stage (~26 ms/640px image) — cache the decoded
        # uint8 array in RAM, or as .npy next to the image for disk cache.
        self.cache = {True: "ram", False: ""}.get(cache, str(cache or "").lower())
        self._im_cache: Dict[int, np.ndarray] = {}
        if self.cache == "ram" and not self._check_cache_ram():
            import logging

            logging.getLogger("tamtr").warning(
                "cache=ram needs more free memory than available; caching disabled"
            )
            self.cache = ""

    def _update_labels(self, classes: Optional[Sequence[int]], single_cls: bool) -> None:
        """Mirror the reference's `BaseDataset.update_labels`
        (`data/base.py:125-141`): with `classes` set, keep only GT rows whose
        class is in the included set (no remap); with `single_cls`, zero every
        GT class. Applied AFTER the label cache loads so the npz cache stays
        unfiltered. Without this, val under single_cls/classes compares
        filtered predictions against unfiltered GT and mAP collapses
        (pred cls 0 vs original gt classes / filtered-out gts counted as FNs).
        """
        if classes is None and not single_cls:
            return
        include = np.asarray(list(classes), np.int32) if classes is not None else None
        for lab in self.labels:
            if include is not None:
                j = np.isin(lab["cls"], include)
                lab["cls"] = lab["cls"][j]
                lab["xywhn"] = lab["xywhn"][j]
                if "segments" in lab:
                    lab["segments"] = [
                        s for s, keep in zip(lab["segments"], j) if keep
                    ]
                if "kpts" in lab:
                    lab["kpts"] = lab["kpts"][j]
            if single_cls:
                lab["cls"] = np.zeros_like(lab["cls"])

    def _check_cache_ram(self, safety: float = 1.3) -> bool:
        """Estimated decoded-set size must fit in ~70% of free RAM
        (reference `check_cache_ram`, `data/base.py:203-220`)."""
        import cv2

        sample = _imread(self.im_files[0])
        if sample is None:
            return False
        need = sample.nbytes * len(self.im_files) * safety
        try:
            avail = os.sysconf("SC_AVPHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
        except (ValueError, OSError):
            return False
        return need < 0.7 * avail

    @staticmethod
    def _glob_images(src) -> List[str]:
        files: List[str] = []
        for p in [src] if isinstance(src, (str, Path)) else list(src):
            p = Path(p)
            if p.is_dir():
                files += sorted(
                    str(f) for f in p.rglob("*") if f.suffix.lower() in IMG_EXTS
                )
            elif p.is_file() and p.suffix == ".txt":
                base = p.parent
                for line in p.read_text().splitlines():
                    line = line.strip()
                    if line:
                        f = Path(line)
                        files.append(str(f if f.is_absolute() else base / f))
            elif p.is_file():
                files.append(str(p))
        return files

    def _cache_path(self) -> Path:
        h = hashlib.sha1("".join(self.im_files).encode()).hexdigest()[:16]
        return Path(self.label_files[0]).parent / f".tamtr_labels_{h}.npz"

    def _load_labels(self, use_cache: bool) -> List[Dict[str, np.ndarray]]:
        cp = self._cache_path()
        if use_cache and cp.exists():
            try:
                z = np.load(cp, allow_pickle=True)
                labels = list(z["labels"])
                if len(labels) == len(self.im_files):
                    return labels
            except Exception:
                pass
        labels = []
        for lf in self.label_files:
            labels.append(self._parse_label_file(lf))
        if use_cache:
            try:
                np.savez_compressed(cp, labels=np.array(labels, dtype=object))
            except Exception:
                pass
        return labels

    def _parse_label_file(self, lf: str) -> Dict[str, np.ndarray]:
        """Parse one YOLO label txt. Formats (reference `verify_image_label`):
        detect: `cls cx cy w h`; segment: `cls x1 y1 ... xn yn` (polygon,
        boxes derived from the polygon extent); pose: `cls cx cy w h
        (px py v) * nk`. All values normalized."""
        rows = []
        try:
            text = Path(lf).read_text()
        except OSError:
            text = ""
        for line in text.splitlines():
            vals = line.split()
            if vals:
                rows.append(np.array(vals, np.float32))
        cls, xywhn, segments, kpts = [], [], [], []
        nk, kdim = self.kpt_shape
        for r in rows:
            if self.task == "segment" and len(r) > 5 and (len(r) - 1) % 2 == 0:
                poly = r[1:].reshape(-1, 2)
                x1, y1 = poly.min(0)
                x2, y2 = poly.max(0)
                xywhn.append([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1])
                segments.append(poly)
                cls.append(r[0])
            elif self.task == "pose" and len(r) == 5 + nk * kdim:
                xywhn.append(r[1:5])
                kpts.append(r[5:].reshape(nk, kdim))
                cls.append(r[0])
            elif len(r) >= 5:
                xywhn.append(r[1:5])
                cls.append(r[0])
                if self.task == "segment":
                    # box-only row in a seg dataset: box corners as polygon
                    cx, cy, w, h = r[1:5]
                    segments.append(np.array(
                        [[cx - w / 2, cy - h / 2], [cx + w / 2, cy - h / 2],
                         [cx + w / 2, cy + h / 2], [cx - w / 2, cy + h / 2]], np.float32))
                elif self.task == "pose":
                    kpts.append(np.zeros((nk, kdim), np.float32))
        out = {
            "cls": np.asarray(cls, np.int32).reshape(-1),
            "xywhn": np.asarray(xywhn, np.float32).reshape(-1, 4).clip(0, 1),
        }
        if self.task == "segment":
            out["segments"] = segments
        if self.task == "pose":
            out["kpts"] = (
                np.stack(kpts) if kpts else np.zeros((0, nk, kdim), np.float32)
            )
        return out

    def __len__(self) -> int:
        return len(self.im_files)

    def _decode(self, i: int) -> np.ndarray:
        """Decoded BGR uint8 image, through the ram/disk cache if enabled.

        The cached array is shared across calls — every downstream
        augmentation writes to a fresh output (cv2 resize/warp/cvtColor,
        mosaic canvas), never in place.
        """
        import cv2

        if self.cache == "ram":
            img = self._im_cache.get(i)
            if img is None:
                img = _imread(self.im_files[i])
                if img is not None:
                    self._im_cache[i] = img  # dict set is atomic under the GIL
            return img
        if self.cache == "disk":
            npy = Path(self.im_files[i]).with_suffix(".npy")
            if npy.exists():
                try:
                    return np.load(npy, mmap_mode="r")
                except Exception:
                    pass
            img = _imread(self.im_files[i])
            if img is not None:
                try:
                    np.save(npy, img)
                except OSError:
                    pass
            return img
        return _imread(self.im_files[i])

    def _read(self, i: int) -> A.Sample:
        img = self._decode(i)
        if img is None:
            raise FileNotFoundError(self.im_files[i])
        h, w = img.shape[:2]
        lab = self.labels[i]
        xywhn = lab["xywhn"]
        boxes = np.empty((len(xywhn), 4), np.float32)
        if len(xywhn):
            cx, cy, bw, bh = (xywhn * np.array([w, h, w, h], np.float32)).T
            boxes[:, 0] = cx - bw / 2
            boxes[:, 1] = cy - bh / 2
            boxes[:, 2] = cx + bw / 2
            boxes[:, 3] = cy + bh / 2
        segs = None
        if "segments" in lab:
            segs = [p * np.array([w, h], np.float32) for p in lab["segments"]]
        kpts = None
        if "kpts" in lab:
            kpts = lab["kpts"].copy()
            kpts[..., 0] *= w
            kpts[..., 1] *= h
        return A.Sample(img, boxes, lab["cls"].copy(), segs, kpts)

    def close_mosaic(self) -> None:
        """Disable mosaic for the final epochs (reference `close_mosaic`)."""
        self._mosaic_on = False

    def _image_shape(self, i: int) -> Tuple[int, int]:
        """(h, w) of image i without decoding pixels (PIL header read)."""
        try:
            from PIL import Image

            with Image.open(self.im_files[i]) as im:
                w, h = im.size
            return h, w
        except Exception:
            return self._read(i).img.shape[:2]

    def set_rectangle(self, batch_size: int, stride: int = 32, pad: float = 0.5) -> None:
        """Aspect-ratio-binned val batch shapes (reference
        `BaseDataset.set_rectangle`, `data/base.py:221-244`): sort images by
        aspect ratio, then give each batch the minimal stride-multiple
        shape that letterboxes its images with the least padding.

        TPU note: every distinct (h, w) is a separate XLA compile of the
        eval step; stride quantization bounds that set (<= imgsz/stride
        shapes per side in the worst case, usually a handful per dataset).
        """
        ni = len(self.im_files)
        shapes = np.array([self._image_shape(i) for i in range(ni)], np.float64)
        bi = np.floor(np.arange(ni) / batch_size).astype(int)
        nb = int(bi[-1]) + 1
        ar = shapes[:, 0] / shapes[:, 1]  # h / w
        irect = ar.argsort()
        self.im_files = [self.im_files[i] for i in irect]
        self.label_files = [self.label_files[i] for i in irect]
        self.labels = [self.labels[i] for i in irect]
        self._im_cache.clear()
        ar = ar[irect]
        out = [[1.0, 1.0]] * nb
        for b in range(nb):
            ari = ar[bi == b]
            mini, maxi = ari.min(), ari.max()
            if maxi < 1:
                out[b] = [maxi, 1.0]
            elif mini > 1:
                out[b] = [1.0, 1.0 / mini]
        self.batch_shapes = (
            np.ceil(np.array(out) * self.imgsz / stride + pad).astype(int) * stride
        )
        self.batch_index = bi
        self.rect = True

    def get_val(self, i: int):
        """Eval sample: (RGB float image, native-space labels, (h, w), lb).

        Square mode (default): stretch-resize to (imgsz, imgsz), lb=None.
        Rect mode (after `set_rectangle`): letterbox (scaleup=False) to the
        image's batch shape; lb=(ratio, left, top) maps predictions back
        to native space."""
        import cv2

        raw = self._read(i)
        h, w = raw.img.shape[:2]
        if getattr(self, "rect", False):
            bh, bw = (int(v) for v in self.batch_shapes[self.batch_index[i]])
            r = min(bh / h, bw / w, 1.0)
            nh, nw = max(round(h * r), 1), max(round(w * r), 1)
            resized = cv2.resize(raw.img, (nw, nh), interpolation=cv2.INTER_LINEAR)
            canvas = np.full((bh, bw, 3), 114, np.uint8)
            top, left = (bh - nh) // 2, (bw - nw) // 2
            canvas[top:top + nh, left:left + nw] = resized
            img = canvas[..., ::-1].astype(np.float32) / 255.0
            return img, raw, (h, w), (r, left, top)
        img = cv2.resize(raw.img, (self.imgsz, self.imgsz), interpolation=cv2.INTER_LINEAR)
        img = img[..., ::-1].astype(np.float32) / 255.0
        return img, raw, (h, w), None

    def get(self, i: int, rng: Optional[np.random.Generator] = None) -> A.Sample:
        """Load + augment one sample at imgsz (stretch/scaleFill path)."""
        rng = rng or self._rng
        s = self.imgsz
        if self.augment:
            # one pipeline for all tasks (reference v8_transforms): segments
            # and keypoints ride through mosaic/copy-paste/perspective/flips
            if self._mosaic_on and rng.random() < self.aug.mosaic:
                n = 9 if self.aug.mosaic_n == 9 else 4
                idxs = [i] + list(rng.integers(0, len(self), n - 1))
                parts = [A.stretch_resize(self._read(j), s) for j in idxs]
                smp = (A.mosaic9 if n == 9 else A.mosaic4)(parts, s, rng)
                border = (-s // 2, -s // 2)
            else:
                smp = A.stretch_resize(self._read(i), s)
                border = (0, 0)
            # reference order: Mosaic -> CopyPaste -> RandomPerspective
            # (`v8_transforms`, augment.py:1018-1031); no-op for box-only
            # labels exactly like the reference
            smp = A.copy_paste(smp, rng, self.aug.copy_paste)
            smp = A.random_perspective(
                smp,
                rng,
                degrees=self.aug.degrees,
                translate=self.aug.translate,
                scale=self.aug.scale,
                shear=self.aug.shear,
                perspective=self.aug.perspective,
                border=border,
            )
            if self.aug.mixup and rng.random() < self.aug.mixup:
                j = int(rng.integers(0, len(self)))
                other = A.random_perspective(
                    A.stretch_resize(self._read(j), s), rng, scale=self.aug.scale,
                    translate=self.aug.translate,
                )
                smp = A.mixup(smp, other, rng)
            # reference position: MixUp -> Albumentations -> RandomHSV
            # (`v8_transforms`, augment.py:1040-1043); no-op unless installed
            smp = A.albumentations_transform(smp, rng)
            smp = A.random_hsv(smp, rng, self.aug.hsv_h, self.aug.hsv_s, self.aug.hsv_v)
            smp = A.random_flip(smp, rng, self.aug.fliplr, self.aug.flipud)
            smp = self._load_text(smp, rng)
        else:
            smp = A.stretch_resize(self._read(i), s)
        return smp

    def _load_text(self, smp: A.Sample, rng: np.random.Generator) -> A.Sample:
        """RandomLoadText (train-time text sampling + class-id remap,
        reference `augment.py:942-1016` inserted before Format for the
        rtdetrworld path, `rtdetrworld/val.py:38-40`)."""
        if not self.random_text:
            return smp
        max_s = min(len(self.class_texts), 80)
        new_cls, keep, texts = A.random_load_text(
            smp.cls, self.class_texts, rng, max_samples=max_s, padding=True
        )
        segs = None
        if smp.segments is not None:
            segs = [p for p, k in zip(smp.segments, keep) if k]
        kpts = smp.keypoints[keep] if smp.keypoints is not None else None
        return A.Sample(smp.img, smp.boxes[keep], new_cls, segs, kpts, texts)


def collate(
    samples: Sequence[A.Sample],
    max_gt: int,
    imgsz: int,
    task: str = "detect",
    kpt_shape: Tuple[int, int] = (17, 3),
    mask_ratio: int = 4,
) -> Dict[str, np.ndarray]:
    """Fixed-shape batch dict (SURVEY A.12 contract, padded).

    segment task adds "masks" (B, M, imgsz/mask_ratio, imgsz/mask_ratio)
    rasterized from polygons; pose adds "keypoints" (B, M, nk, kdim) pixels.
    """
    import cv2

    B = len(samples)
    # BGR->RGB straight into the batch array: cv2.cvtColor's SIMD swap is
    # ~10x the numpy strided copy a stack of `img[..., ::-1]` views costs
    img = np.empty((B,) + samples[0].img.shape, np.uint8)
    for b, s in enumerate(samples):
        cv2.cvtColor(s.img, cv2.COLOR_BGR2RGB, dst=img[b])
    cls = np.zeros((B, max_gt), np.int32)
    boxes = np.zeros((B, max_gt, 4), np.float32)
    mask = np.zeros((B, max_gt), bool)
    if task == "segment":
        hm = imgsz // mask_ratio
        seg_masks = np.zeros((B, max_gt, hm, hm), np.float32)
    if task == "pose":
        keypoints = np.zeros((B, max_gt) + tuple(kpt_shape), np.float32)
    for b, s in enumerate(samples):
        n = min(len(s.cls), max_gt)
        if n:
            # largest boxes first when truncating (stable detection signal)
            if len(s.cls) > max_gt:
                areas = (s.boxes[:, 2] - s.boxes[:, 0]) * (s.boxes[:, 3] - s.boxes[:, 1])
                order = np.argsort(-areas)[:max_gt]
            else:
                order = np.arange(n)
            b_xyxy = s.boxes[order]
            cx = (b_xyxy[:, 0] + b_xyxy[:, 2]) / 2 / imgsz
            cy = (b_xyxy[:, 1] + b_xyxy[:, 3]) / 2 / imgsz
            bw = (b_xyxy[:, 2] - b_xyxy[:, 0]) / imgsz
            bh = (b_xyxy[:, 3] - b_xyxy[:, 1]) / imgsz
            boxes[b, :n] = np.stack([cx, cy, bw, bh], -1)
            cls[b, :n] = s.cls[order]
            mask[b, :n] = True
            if task == "segment" and s.segments is not None:
                import cv2

                hm = imgsz // mask_ratio
                for j, oi in enumerate(order):
                    poly = (s.segments[int(oi)] / mask_ratio).astype(np.int32)
                    cv2.fillPoly(seg_masks[b, j], [poly], 1.0)
            if task == "pose" and s.keypoints is not None:
                keypoints[b, :n] = s.keypoints[order]
    out = {"img": img, "cls": cls, "bboxes": boxes, "mask": mask}
    if task == "segment":
        out["masks"] = seg_masks
    if task == "pose":
        out["keypoints"] = keypoints
    if any(s.texts is not None for s in samples):
        out["texts"] = [s.texts or [] for s in samples]  # (B, K) strings
    return out


def build_loader(
    dataset: DetectionDataset,
    batch_size: int,
    max_gt: int = 128,
    shuffle: bool = True,
    seed: int = 0,
    workers: int = 8,
    process_index: int = 0,
    process_count: int = 1,
    drop_last: bool = True,
    prefetch: int = 4,
) -> "Loader":
    return Loader(
        dataset, batch_size, max_gt, shuffle, seed, workers, process_index, process_count,
        drop_last, prefetch,
    )


class Loader:
    """Threaded prefetching loader with per-epoch shuffling + host sharding."""

    def __init__(
        self, dataset, batch_size, max_gt, shuffle, seed, workers,
        process_index, process_count, drop_last, prefetch,
    ):
        self.ds = dataset
        self.bs = batch_size
        self.max_gt = max_gt
        self.shuffle = shuffle
        self.seed = seed
        self.workers = workers
        self.pi = process_index
        self.pc = process_count
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.ds) // self.pc
        return n // self.bs if self.drop_last else math.ceil(n / self.bs)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed + self.epoch)
        idxs = np.arange(len(self.ds))
        if self.shuffle:
            rng.shuffle(idxs)
        idxs = idxs[self.pi :: self.pc]  # per-host shard
        n_batches = len(self)
        pool = ThreadPoolExecutor(max_workers=max(self.workers, 1))
        try:
            def make_batch(bi):
                batch_idx = idxs[bi * self.bs : (bi + 1) * self.bs]
                srng = np.random.default_rng((self.seed, self.epoch, bi))
                samples = [self.ds.get(int(i), srng) for i in batch_idx]
                return collate(
                    samples, self.max_gt, self.ds.imgsz,
                    task=getattr(self.ds, "task", "detect"),
                    kpt_shape=getattr(self.ds, "kpt_shape", (17, 3)),
                )

            futures = {}
            for bi in range(min(self.prefetch, n_batches)):
                futures[bi] = pool.submit(make_batch, bi)
            for bi in range(n_batches):
                nxt = bi + self.prefetch
                if nxt < n_batches:
                    futures[nxt] = pool.submit(make_batch, nxt)
                yield futures.pop(bi).result()
        finally:
            pool.shutdown(wait=False, cancel_futures=True)


# ---------------------------------------------------------------------------
# Classification (reference `data/dataset.py:ClassificationDataset` +
# `check_cls_dataset`, `data/utils.py:402-460`): ImageFolder layout —
# root/<split>/<class_name>/*.jpg — with light train augmentation.
# ---------------------------------------------------------------------------


class ClassificationDataset:
    """Folder-per-class image classification dataset."""

    IMG_EXTS = {".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp"}

    def __init__(
        self,
        root: str,
        imgsz: int = 224,
        augment: bool = False,
        scale: Tuple[float, float] = (0.5, 1.0),
        fliplr: float = 0.5,
        seed: int = 0,
    ) -> None:
        self.root = Path(root)
        self.imgsz = imgsz
        self.augment = augment
        self.scale = scale
        self.fliplr = fliplr
        self.seed = seed
        classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        if not classes:
            raise FileNotFoundError(f"no class folders under {root}")
        self.names = classes
        self.samples: List[Tuple[str, int]] = []
        for ci, cname in enumerate(classes):
            for f in sorted((self.root / cname).rglob("*")):
                if f.suffix.lower() in self.IMG_EXTS:
                    self.samples.append((str(f), ci))

    def __len__(self) -> int:
        return len(self.samples)

    def get(self, i: int, rng: Optional[np.random.Generator] = None) -> Tuple[np.ndarray, int]:
        """Returns (img (S, S, 3) float32 RGB in [0,1], class index)."""
        import cv2

        path, label = self.samples[i]
        img = _imread(path)
        if img is None:
            raise FileNotFoundError(path)
        h, w = img.shape[:2]
        s = self.imgsz
        if self.augment and rng is not None:
            # random-resized-crop (area-scale jitter) + horizontal flip
            area = rng.uniform(*self.scale) * h * w
            ar = rng.uniform(3 / 4, 4 / 3)
            cw = int(round(np.sqrt(area * ar)))
            ch = int(round(np.sqrt(area / ar)))
            cw, ch = min(cw, w), min(ch, h)
            x0 = rng.integers(0, w - cw + 1)
            y0 = rng.integers(0, h - ch + 1)
            img = img[y0 : y0 + ch, x0 : x0 + cw]
            img = cv2.resize(img, (s, s), interpolation=cv2.INTER_LINEAR)
            if rng.random() < self.fliplr:
                img = img[:, ::-1]
        else:
            # resize short side then center-crop (torchvision eval convention)
            r = s / min(h, w)
            img = cv2.resize(img, (max(s, round(w * r)), max(s, round(h * r))))
            hh, ww = img.shape[:2]
            y0, x0 = (hh - s) // 2, (ww - s) // 2
            img = img[y0 : y0 + s, x0 : x0 + s]
        return np.ascontiguousarray(img[..., ::-1], np.float32) / 255.0, label


class ClassificationLoader:
    """Batched loader for ClassificationDataset (per-epoch shuffle, host shard)."""

    def __init__(
        self,
        dataset: ClassificationDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        process_index: int = 0,
        process_count: int = 1,
    ) -> None:
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.pi, self.pc = process_index, process_count
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self.ds) // self.pc
        return n // self.bs if self.drop_last else (n + self.bs - 1) // self.bs

    def __iter__(self):
        idxs = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idxs)
        idxs = idxs[self.pi :: self.pc]
        rng = np.random.default_rng(self.seed * 9973 + self._epoch)
        for s in range(0, len(idxs) - (self.bs - 1 if self.drop_last else 0), self.bs):
            chunk = idxs[s : s + self.bs]
            if len(chunk) < self.bs and self.drop_last:
                break
            imgs, labels = zip(*(self.ds.get(int(i), rng) for i in chunk))
            yield {
                "img": np.stack(imgs),
                "cls": np.asarray(labels, np.int32)[:, None],
            }
