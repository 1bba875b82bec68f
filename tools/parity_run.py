#!/usr/bin/env python
"""Parity training run: train N epochs on VisDrone and report the mAP curve.

The 300-epoch protocol (`/root/reference/trainTAMTR.py:8-17`: batch 6,
imgsz 640, AdamW 1e-4, warmup 2000 iters; eval `valTAMTR.py:5-17`: conf 0.4,
NMS iou 0.6) is one command once the dataset and text embeddings exist:

  python tools/get_visdrone.py --root /data/visdrone          # once
  python tools/encode_texts.py --data /data/visdrone/visdrone.yaml \
         --out visdrone_clip.npz                              # once (needs CLIP ckpt)
  python tools/parity_run.py --data /data/visdrone/visdrone.yaml \
         --text-embeddings visdrone_clip.npz --epochs 300

Short smoke runs (--epochs 5 --fraction 0.05) print the per-epoch mAP curve
from results.csv so recipe regressions show up before burning a full run.
"""

from __future__ import annotations

import argparse
import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", required=True)
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--text-embeddings", default=None)
    ap.add_argument("--name", default="parity")
    ap.add_argument("--max-gt", type=int, default=300)
    ap.add_argument("--val-interval", type=int, default=1)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)

    from tamtr_tpu.api import TAMTR

    model = TAMTR("tamtr.yaml")
    metrics = model.train(
        data=args.data,
        epochs=args.epochs,
        batch=args.batch,
        imgsz=args.imgsz,
        text_embeddings=args.text_embeddings,
        name=args.name,
        exist_ok=True,
        resume=args.resume,
        max_gt=args.max_gt,
        val_interval=args.val_interval,
        save_json=True,
    )
    run_dir = Path(getattr(model._lazy_engine(), "_last_run_dir", f"runs/detect/{args.name}"))
    csv_path = run_dir / "results.csv"
    if csv_path.exists():
        print("\nmAP curve (epoch, mAP50, mAP50-95, fitness):")
        with open(csv_path) as f:
            for row in csv.DictReader(f):
                keys = {k.strip(): v for k, v in row.items() if k}
                print(
                    "  {:>4} {:>8} {:>8} {:>8}".format(
                        keys.get("epoch", "?"),
                        keys.get("mAP50", keys.get("map50", "-")),
                        keys.get("mAP50-95", keys.get("map", "-")),
                        keys.get("fitness", "-"),
                    )
                )
    print("\nfinal:", {k: round(v, 4) for k, v in metrics.items() if isinstance(v, float)})
    target = 0.397
    if metrics.get("mAP50", 0) >= target:
        print(f"PARITY: mAP50 {metrics['mAP50']:.3f} >= {target} (reference README.md:34-35)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
