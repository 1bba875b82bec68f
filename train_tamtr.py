"""Train TAM-TR on VisDrone — same workflow as the reference `trainTAMTR.py`.

Usage:
    python train_tamtr.py --data dataset/visdrone.yaml --imgsz 640 \
        --epochs 300 --batch 6 --workers 8
"""

import argparse

from tamtr_tpu import TAMTR


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="tamtr.yaml")
    p.add_argument("--data", required=True)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--batch", type=int, default=6)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--project", default="runs/train")
    p.add_argument("--name", default="exp")
    p.add_argument("--text-embeddings", default=None, help="npz with CLIP class embeddings")
    args = p.parse_args()

    model = TAMTR(args.model)
    model.train(
        data=args.data,
        imgsz=args.imgsz,
        epochs=args.epochs,
        batch=args.batch,
        workers=args.workers,
        project=args.project,
        name=args.name,
        text_embeddings=args.text_embeddings,
    )


if __name__ == "__main__":
    main()
