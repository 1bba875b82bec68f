"""Host input-pipeline throughput: can the loader feed the chip?

The train step runs at ~18.6 img/s/chip (bf16 b8, BENCH_r03); the host
pipeline (threaded cv2 decode + full TAM-TR augmentation recipe + padded
collate, `data/dataset.py`) must sustain at least that per chip or training
becomes input-bound (the reference feeds from torch DataLoader workers —
hot loop #6 in SURVEY.md §3).

Builds a throwaway on-disk dataset of 640px JPEGs with VisDrone-like label
density (~50 boxes/img), then times full epochs through `build_loader` with
the shipped recipe augmentations (scale 0.9, copy_paste 0.3, HSV, flip —
mosaic off per `cfg/default.yaml:113`, plus a `--mosaic` variant).

Usage:
  python tools/bench_data.py [--n=256] [--workers=8] [--batch=8] [--mosaic]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

import numpy as np


def make_dataset(root: Path, n: int, imgsz: int = 640, boxes: int = 50) -> Path:
    import cv2

    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 255, (imgsz, imgsz, 3), np.uint8)
        cv2.imwrite(str(root / "images" / f"{i:05d}.jpg"), img)
        rows = []
        for _ in range(boxes):
            w, h = rng.uniform(0.01, 0.2, 2)
            x, y = rng.uniform(w / 2, 1 - w / 2), rng.uniform(h / 2, 1 - h / 2)
            rows.append(f"{rng.integers(0, 10)} {x:.4f} {y:.4f} {w:.4f} {h:.4f}")
        (root / "labels" / f"{i:05d}.txt").write_text("\n".join(rows) + "\n")
    return root / "images"


def main() -> None:
    n, workers, batch, imgsz, mosaic, cache = 256, 8, 8, 640, False, False
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=")[1])
        elif a.startswith("--workers="):
            workers = int(a.split("=")[1])
        elif a.startswith("--batch="):
            batch = int(a.split("=")[1])
        elif a == "--mosaic":
            mosaic = True
        elif a.startswith("--cache"):
            cache = a.split("=")[1] if "=" in a else "ram"

    from tamtr_tpu.data.dataset import AugConfig, DetectionDataset, build_loader

    with tempfile.TemporaryDirectory() as td:
        img_dir = make_dataset(Path(td), n, imgsz)
        aug = AugConfig(mosaic=1.0 if mosaic else 0.0)
        ds = DetectionDataset(str(img_dir), imgsz=imgsz, augment=True, aug=aug, cache=cache)
        loader = build_loader(ds, batch, max_gt=300, workers=workers)
        # warm epoch (cache build, thread pool spin-up)
        for b in loader:
            pass
        best = 0.0
        for epoch in range(1, 4):
            loader.set_epoch(epoch)
            t0 = time.perf_counter()
            seen = 0
            for b in loader:
                seen += b["img"].shape[0]
            best = max(best, seen / (time.perf_counter() - t0))
        print(
            f"host pipeline: {best:.1f} img/s "
            f"(n={n} batch={batch} workers={workers} mosaic={mosaic} cache={cache}, "
            f"full augment recipe, max_gt=300 collate)"
        )


if __name__ == "__main__":
    main()
