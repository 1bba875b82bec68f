#!/usr/bin/env python
"""Fetch + convert VisDrone2019-DET into the YOLO layout this repo trains on.

The reference trains on VisDrone2019 with nc=10
(`/root/reference/dataset/visdrone.yaml`) and scores `split='val'` against
the test-dev images (BASELINE.md caveat). This tool:

1. downloads the official zips (train/val/test-dev) — ultralytics mirrors
   them on GitHub releases; pass --url-base to use a different mirror;
2. converts VisDrone annotation txts (per-image rows of
   `left,top,w,h,score,category,truncation,occlusion`) to YOLO labels:
   keep rows with score != 0 and category in 1..10, class id = category - 1,
   boxes -> normalized cxcywh;
3. writes `<root>/visdrone.yaml` pointing train -> DET-train and
   val -> DET-test-dev (replicating the reference's eval protocol).

This build environment has NO network egress: run the download step on a
networked machine (or copy the zips into `<root>/downloads/`), then run with
--convert-only here.

Usage:
  python tools/get_visdrone.py --root /data/visdrone            # fetch+convert
  python tools/get_visdrone.py --root /data/visdrone --convert-only
"""

from __future__ import annotations

import argparse
import sys
import zipfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ZIPS = {
    "VisDrone2019-DET-train": "VisDrone2019-DET-train.zip",
    "VisDrone2019-DET-val": "VisDrone2019-DET-val.zip",
    "VisDrone2019-DET-test-dev": "VisDrone2019-DET-test-dev.zip",
}
DEFAULT_URL_BASE = "https://github.com/ultralytics/assets/releases/download/v0.0.0/"
NAMES = [
    "pedestrian", "people", "bicycle", "car", "van", "truck", "tricycle",
    "awning-tricycle", "bus", "motor",
]


def download(root: Path, url_base: str) -> None:
    from tamtr_tpu.utils.downloads import safe_download

    dl = root / "downloads"
    dl.mkdir(parents=True, exist_ok=True)
    for z in ZIPS.values():
        dst = dl / z
        if dst.exists():
            print(f"have {z}")
            continue
        print(f"downloading {url_base + z} ...")
        safe_download(url_base + z, file=dst, unzip=False, retry=3)


def extract(root: Path) -> None:
    dl = root / "downloads"
    for split, z in ZIPS.items():
        if (root / split).is_dir():
            continue
        src = dl / z
        if not src.exists():
            print(f"WARNING: {src} missing; skipping {split}")
            continue
        print(f"extracting {z} ...")
        with zipfile.ZipFile(src) as f:
            f.extractall(root)


def convert_split(split_dir: Path) -> int:
    """VisDrone annotations/ -> labels/ (YOLO normalized cxcywh)."""
    try:
        import cv2
    except ImportError:
        cv2 = None
    from PIL import Image  # lightweight size read fallback

    ann_dir = split_dir / "annotations"
    img_dir = split_dir / "images"
    lab_dir = split_dir / "labels"
    if not ann_dir.is_dir() or not img_dir.is_dir():
        return 0
    lab_dir.mkdir(exist_ok=True)
    n = 0
    for ann in sorted(ann_dir.glob("*.txt")):
        img = next(
            (img_dir / (ann.stem + ext) for ext in (".jpg", ".png", ".jpeg")
             if (img_dir / (ann.stem + ext)).exists()),
            None,
        )
        if img is None:
            continue
        if cv2 is not None:
            im = cv2.imread(str(img))
            h, w = im.shape[:2]
        else:
            with Image.open(img) as im:
                w, h = im.size
        lines = []
        for row in ann.read_text().splitlines():
            vals = row.strip().strip(",").split(",")
            if len(vals) < 6:
                continue
            left, top, bw, bh, score, cat = (float(v) for v in vals[:6])
            # score==0 marks ignored regions; categories 0 (ignored) and 11
            # (others) are dropped; 1..10 -> class 0..9
            if score == 0 or not (1 <= cat <= 10) or bw <= 0 or bh <= 0:
                continue
            cx = (left + bw / 2) / w
            cy = (top + bh / 2) / h
            lines.append(
                f"{int(cat) - 1} {cx:.6f} {cy:.6f} {bw / w:.6f} {bh / h:.6f}"
            )
        (lab_dir / (ann.stem + ".txt")).write_text("\n".join(lines) + "\n")
        n += 1
    return n


def write_yaml(root: Path) -> Path:
    out = root / "visdrone.yaml"
    # reference protocol: val key -> test-dev images (BASELINE.md caveat)
    out.write_text(
        "path: {root}\n"
        "train: VisDrone2019-DET-train/images\n"
        "val: VisDrone2019-DET-test-dev/images\n"
        "test: VisDrone2019-DET-test-dev/images\n"
        "nc: 10\n"
        "names: [{names}]\n".format(root=root.resolve(), names=", ".join(NAMES))
    )
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True, help="dataset root directory")
    ap.add_argument("--url-base", default=DEFAULT_URL_BASE)
    ap.add_argument("--convert-only", action="store_true",
                    help="skip downloading (zips or extracted dirs already present)")
    args = ap.parse_args(argv)
    root = Path(args.root)
    root.mkdir(parents=True, exist_ok=True)
    if not args.convert_only:
        try:
            download(root, args.url_base)
        except Exception as e:  # noqa: BLE001
            print(f"download failed ({e}); place zips under {root}/downloads "
                  "and re-run with --convert-only", file=sys.stderr)
    extract(root)
    total = 0
    for split in ZIPS:
        n = convert_split(root / split)
        print(f"{split}: {n} label files")
        total += n
    yaml_path = write_yaml(root)
    print(f"wrote {yaml_path}")
    if total == 0:
        print("no splits converted — data missing?", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
