"""Annotated-image output + training-curve plots (reference `utils/plotting.py`).

Minimal host-side equivalents of `Annotator`/`plot_results`: box drawing with
class/conf labels via cv2; results.csv curves via matplotlib when available.
"""

from __future__ import annotations

import colorsys
from pathlib import Path
from typing import Dict, List, Sequence

import numpy as np


def _palette(n: int) -> List[tuple]:
    return [
        tuple(int(c * 255) for c in colorsys.hsv_to_rgb(i / max(n, 1), 0.8, 0.95))
        for i in range(n)
    ]


def annotate_image(
    img_bgr: np.ndarray,
    boxes: np.ndarray,
    scores: np.ndarray,
    labels: np.ndarray,
    names: Sequence[str],
    line_width: int | None = None,
) -> np.ndarray:
    import cv2

    out = img_bgr.copy()
    lw = line_width or max(round(sum(out.shape[:2]) / 2 * 0.003), 2)
    colors = _palette(max(len(names), 1))
    for b, s, l in zip(boxes, scores, labels):
        c = colors[int(l) % len(colors)]
        p1, p2 = (int(b[0]), int(b[1])), (int(b[2]), int(b[3]))
        cv2.rectangle(out, p1, p2, c, lw, cv2.LINE_AA)
        name = names[int(l)] if int(l) < len(names) else str(int(l))
        label = f"{name} {float(s):.2f}"
        tf = max(lw - 1, 1)
        w, h = cv2.getTextSize(label, 0, lw / 3, tf)[0]
        cv2.rectangle(out, p1, (p1[0] + w, p1[1] - h - 3), c, -1, cv2.LINE_AA)
        cv2.putText(out, label, (p1[0], p1[1] - 2), 0, lw / 3, (255, 255, 255), tf, cv2.LINE_AA)
    return out


def save_annotated(results: List[Dict], save_dir: str | Path) -> None:
    import cv2

    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    for r in results:
        img = cv2.imread(r["path"])
        out = annotate_image(img, r["boxes"], r["scores"], r["labels"], r["names"])
        cv2.imwrite(str(save_dir / Path(r["path"]).name), out)


def plot_results(csv_path: str | Path, save_path: str | Path | None = None) -> None:
    """Training curves from results.csv (reference `plot_results`)."""
    import csv as _csv

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    rows = list(_csv.DictReader(open(csv_path)))
    if not rows:
        return
    keys = [k for k in rows[0] if k != "epoch"]
    epochs = [float(r["epoch"]) for r in rows]
    n = len(keys)
    fig, axes = plt.subplots((n + 3) // 4, 4, figsize=(16, 3 * ((n + 3) // 4)))
    for ax, k in zip(np.ravel(axes), keys):
        ax.plot(epochs, [float(r[k] or 0) for r in rows])
        ax.set_title(k)
    fig.tight_layout()
    fig.savefig(save_path or Path(csv_path).with_name("results.png"), dpi=120)
    plt.close(fig)


def plot_images(
    images: np.ndarray,
    batch_idx: np.ndarray,
    cls: np.ndarray,
    bboxes: np.ndarray,
    names: List[str] | None = None,
    save_path: str | Path | None = None,
    max_subplots: int = 16,
) -> np.ndarray:
    """Training-batch mosaic (reference `plotting.py:plot_images`, `:367`).

    images: (B, H, W, 3) float [0,1] or uint8; bboxes normalized xywh;
    batch_idx maps each box to its image. Returns the mosaic (and saves it
    when save_path is given).
    """
    import cv2

    bs = min(len(images), max_subplots)
    ns = int(np.ceil(bs ** 0.5))
    h, w = images.shape[1:3]
    mosaic = np.full((ns * h, ns * w, 3), 255, np.uint8)
    pal = _palette(int(cls.max()) + 1 if len(cls) else 1)
    for i in range(bs):
        im = images[i]
        if im.dtype != np.uint8:
            im = (np.clip(im, 0, 1) * 255).astype(np.uint8)
        y0, x0 = (i // ns) * h, (i % ns) * w
        tile = np.ascontiguousarray(im[..., ::-1])  # RGB -> BGR for cv2
        sel = np.asarray(batch_idx) == i
        for c, (cx, cy, bw, bh) in zip(np.asarray(cls)[sel], np.asarray(bboxes)[sel]):
            x1 = int((cx - bw / 2) * w)
            y1 = int((cy - bh / 2) * h)
            x2 = int((cx + bw / 2) * w)
            y2 = int((cy + bh / 2) * h)
            color = pal[int(c) % len(pal)]
            cv2.rectangle(tile, (x1, y1), (x2, y2), color, 1)
            label = names[int(c)] if names and int(c) < len(names) else str(int(c))
            cv2.putText(tile, label, (x1, max(y1 - 2, 8)), cv2.FONT_HERSHEY_SIMPLEX,
                        0.3, color, 1)
        mosaic[y0 : y0 + h, x0 : x0 + w] = tile
    if save_path is not None:
        cv2.imwrite(str(save_path), mosaic)
    return mosaic


def feature_visualization(
    feats, save_dir: str | Path, stage: str = "", max_channels: int = 32
) -> List[Path]:
    """Save per-level feature-map channel grids (reference
    `plotting.py:feature_visualization`, `:658`). `feats` is a list of
    (B, H, W, C) arrays (e.g. from `model.apply(..., features_only=True)`)."""
    import cv2

    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    out_paths = []
    for li, f in enumerate(feats):
        f = np.asarray(f)[0]  # first image, (H, W, C)
        n = min(max_channels, f.shape[-1])
        ns = int(np.ceil(n ** 0.5))
        h, w = f.shape[:2]
        grid = np.zeros((ns * h, ns * w), np.float32)
        for c in range(n):
            ch = f[..., c]
            lo, hi = ch.min(), ch.max()
            ch = (ch - lo) / (hi - lo + 1e-9)
            grid[(c // ns) * h : (c // ns + 1) * h, (c % ns) * w : (c % ns + 1) * w] = ch
        img = (grid * 255).astype(np.uint8)
        p = save_dir / f"features{('_' + stage) if stage else ''}_level{li}.png"
        cv2.imwrite(str(p), cv2.applyColorMap(img, cv2.COLORMAP_VIRIDIS))
        out_paths.append(p)
    return out_paths
