"""Predict with TAM-TR — same workflow as the reference `predictTAMTR.py`.

Usage:
    python predict_tamtr.py --weights runs/train/exp/weights/best \
        --source images/ --conf 0.4 --iou 0.6 --save
"""

import argparse

from tamtr_tpu import TAMTR


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True)
    p.add_argument("--source", required=True)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--conf", type=float, default=0.4)
    p.add_argument("--iou", type=float, default=0.6)
    p.add_argument("--save", action="store_true")
    p.add_argument("--save-dir", default="runs/predict")
    args = p.parse_args()

    model = TAMTR()
    model.load(args.weights)
    results = model.predict(args.source, imgsz=args.imgsz, conf=args.conf, iou=args.iou)
    for r in results:
        print(f"{r['path']}: {len(r['scores'])} detections")
    if args.save:
        from tamtr_tpu.utils.plotting import save_annotated

        save_annotated(results, args.save_dir)
        print(f"annotated images saved to {args.save_dir}")


if __name__ == "__main__":
    main()
