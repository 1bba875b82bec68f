#!/usr/bin/env python
"""End-to-end learning check: train TAM-TR on a generated synthetic box
dataset and report the mAP curve. Needs no external data, so it runs in
this zero-egress image; it is the recipe-regression canary while the
VisDrone parity run (tools/parity_run.py) waits on data + CLIP weights.

The dataset is class-colored rectangles (red/green/blue, jittered) on a
noise background — visually separable, so a healthy pipeline drives
mAP50 -> ~1.0. The run exercises the FULL production path: host cv2
augmentations (perspective/HSV/flip per the TAM-TR recipe), text
contrastive heads (hash embeddings: fixed random unit vectors are still
class-discriminative), CDN denoising, on-device auction matching, RIOU
loss, gradient accumulation, EMA eval weights, and the conf/NMS val
protocol (reference `valTAMTR.py:5-17`).

Usage (TPU):
  PYTHONPATH=/root/.axon_site:/root/repo python tools/smoke_train.py \
      --root /tmp/smoke --epochs 240

Exit code is non-zero when final mAP50 < --pass-map50 (default 0.5), so
this doubles as a hardware-level CI gate.
"""

from __future__ import annotations

import argparse
import csv
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CLASS_COLORS = {0: (40, 40, 200), 1: (40, 200, 40), 2: (200, 40, 40)}  # BGR
NAMES = {0: "red box", 1: "green box", 2: "blue box"}


def make_dataset(root: Path, n_train: int, n_val: int, imgsz: int, seed: int = 0):
    """Write YOLO-layout images/labels + data.yaml under `root`."""
    import cv2
    import yaml

    for split, n, s in (("train", n_train, seed), ("val", n_val, seed + 1)):
        rng = np.random.default_rng(s)
        (root / split / "images").mkdir(parents=True, exist_ok=True)
        (root / split / "labels").mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = rng.integers(90, 150, (imgsz, imgsz, 3), dtype=np.uint8)
            lines = []
            for _ in range(int(rng.integers(2, 7))):
                c = int(rng.integers(0, 3))
                w, h = rng.uniform(0.08, 0.3, 2)
                cx = rng.uniform(w / 2, 1 - w / 2)
                cy = rng.uniform(h / 2, 1 - h / 2)
                x1, y1 = int((cx - w / 2) * imgsz), int((cy - h / 2) * imgsz)
                x2, y2 = int((cx + w / 2) * imgsz), int((cy + h / 2) * imgsz)
                color = tuple(
                    int(np.clip(v + rng.integers(-30, 30), 0, 255))
                    for v in CLASS_COLORS[c]
                )
                cv2.rectangle(img, (x1, y1), (x2, y2), color, -1)
                lines.append(f"{c} {cx:.4f} {cy:.4f} {w:.4f} {h:.4f}")
            cv2.imwrite(str(root / split / "images" / f"im{i:03d}.jpg"), img)
            (root / split / "labels" / f"im{i:03d}.txt").write_text("\n".join(lines))
    yml = root / "data.yaml"
    yml.write_text(
        yaml.safe_dump(
            {
                "path": str(root),
                "train": "train/images",
                "val": "val/images",
                "nc": 3,
                "names": NAMES,
            }
        )
    )
    return yml


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="/tmp/tamtr_smoke")
    ap.add_argument("--model", default="tamtr.yaml")
    ap.add_argument("--epochs", type=int, default=240)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--n-train", type=int, default=16)
    ap.add_argument("--n-val", type=int, default=8)
    ap.add_argument("--max-gt", type=int, default=32)
    ap.add_argument("--warmup", type=int, default=100, help="warmup iterations")
    ap.add_argument("--val-interval", type=int, default=20)
    ap.add_argument("--pass-map50", type=float, default=0.5)
    # learning-curve canary, not the parity protocol: the reference's
    # conf=0.4 hides all detections until scores calibrate late in training
    ap.add_argument("--conf", type=float, default=0.05)
    # nominal batch for gradient accumulation. The recipe default (64)
    # means one optimizer step per 64/batch micro-batches — right for
    # VisDrone-scale runs, but on a 16-image canary it cuts the update
    # count 16x and the loss plateaus. Default pins accumulate=1.
    ap.add_argument("--nbs", type=int, default=0, help="0 = same as --batch")
    ap.add_argument("--name", default="smoke")
    # text-dependence check: after training, re-validate with the class
    # embedding rows cyclically shuffled — if the contrastive heads
    # (`nn/decoder.py:ContrastiveHead`, reference `block.py:522-542`) truly
    # score regions against text, mAP must crater (classes swap labels).
    ap.add_argument("--text-check", action="store_true")
    ap.add_argument("--text-check-ratio", type=float, default=0.5,
                    help="fail if shuffled mAP50 > ratio * trained mAP50")
    args = ap.parse_args(argv)

    root = Path(args.root)
    yml = make_dataset(root, args.n_train, args.n_val, args.imgsz)

    from tamtr_tpu.api import TAMTR

    model = TAMTR(args.model)
    metrics = model.train(
        data=str(yml),
        epochs=args.epochs,
        batch=args.batch,
        imgsz=args.imgsz,
        max_gt=args.max_gt,
        warmup_epochs=args.warmup,  # reference quirk: counted in iterations
        val_interval=args.val_interval,
        save_interval=args.val_interval,  # tunnel fetch of ~0.8 GB per save
        conf=args.conf,
        nbs=args.nbs or args.batch,
        name=args.name,
        project=str(root / "runs"),
        exist_ok=True,
        workers=2,
        plots=False,
    )

    csv_path = root / "runs" / args.name / "results.csv"
    if csv_path.exists():
        print("\nmAP curve (epoch, mAP50, mAP50-95, fitness):")
        with open(csv_path) as f:
            for row in csv.DictReader(f):
                keys = {k.strip(): v for k, v in row.items() if k}
                print(
                    "  {:>4} {:>8} {:>8} {:>8}".format(
                        keys.get("epoch", "?"),
                        keys.get("mAP50", "-"),
                        keys.get("mAP50-95", "-"),
                        keys.get("fitness", "-"),
                    )
                )
    final = {k: round(v, 4) for k, v in metrics.items() if isinstance(v, float)}
    print("\nfinal:", final)
    ok = metrics.get("mAP50", 0.0) >= args.pass_map50
    print(("PASS" if ok else "FAIL")
          + f": mAP50 {metrics.get('mAP50', 0.0):.3f} vs gate {args.pass_map50}")

    if args.text_check and ok:
        # The text table rows carry the per-class identity the contrastive
        # heads score against; a cyclic row shuffle relabels every class, so
        # class-matched TPs (and mAP) must collapse if — and only if — the
        # text branch carries signal (hash embeddings are near-orthogonal
        # unit vectors, so this is a semantic check, not a norm check).
        eng = model._lazy_engine()
        names = [NAMES[i] for i in range(len(NAMES))]
        good = metrics.get("mAP50", 0.0)
        shuffled = np.roll(np.asarray(eng.txt_feats, np.float32), 1, axis=0)
        eng.set_classes(names, shuffled)
        m_shuf = model.val(data=str(yml), conf=args.conf,
                           project=str(root / "runs"), name=args.name + "_shuf",
                           exist_ok=True, plots=False)
        bad = m_shuf.get("mAP50", 0.0)
        crater = bad <= args.text_check_ratio * good
        print(f"text-check: trained mAP50 {good:.3f} -> shuffled-text "
              f"{bad:.3f} ({'PASS' if crater else 'FAIL'}: contrastive heads "
              f"{'do' if crater else 'do NOT'} depend on the text rows)")
        return 0 if crater else 1
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
