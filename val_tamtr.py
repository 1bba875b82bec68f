"""Evaluate TAM-TR — same workflow as the reference `valTAMTR.py`.

Usage:
    python val_tamtr.py --weights runs/train/exp/weights/best \
        --data dataset/visdrone.yaml --conf 0.4 --iou 0.6
"""

import argparse

from tamtr_tpu import TAMTR


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--split", default="val")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--conf", type=float, default=0.4)
    p.add_argument("--iou", type=float, default=0.6)
    p.add_argument("--save-json", action="store_true")
    args = p.parse_args()

    model = TAMTR()
    model.load(args.weights)
    res = model.val(
        data=args.data, split=args.split, imgsz=args.imgsz, batch=args.batch,
        conf=args.conf, iou=args.iou, save_json=args.save_json,
    )
    print(res)


if __name__ == "__main__":
    main()
