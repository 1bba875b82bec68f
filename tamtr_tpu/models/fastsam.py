"""FastSAM-style prompt post-processing over segmentation Results.

Capability rebuild of the reference `models/fastsam/prompt.py`: given the
everything-mode output of a segmentation model (all instance masks), select
masks by box, point, or text prompts. The reference's text prompt encodes
image crops with CLIP; without an image encoder in this environment the text
prompt matches against detected class names through the text-embedding table
(documented deviation; the hook accepts any embedding function).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from tamtr_tpu.engine.results import Results


def _mask_to_fullres(mask: np.ndarray, shape_hw: Tuple[int, int]) -> np.ndarray:
    import cv2

    return cv2.resize(mask.astype(np.float32), (shape_hw[1], shape_hw[0])) > 0.5


class FastSAMPrompt:
    """Prompt-based selection over one image's segmentation Results."""

    def __init__(self, result: Results):
        assert result.masks is not None, "prompting needs a segmentation Results"
        self.result = result
        self.shape = result.orig_shape or (1, 1)

    def everything(self) -> np.ndarray:
        """(N, H, W) bool masks at original resolution."""
        return np.stack(
            [_mask_to_fullres(m, self.shape) for m in self.result.masks]
        ) if len(self.result) else np.zeros((0,) + tuple(self.shape), bool)

    def box_prompt(self, box_xyxy: Sequence[float]) -> np.ndarray:
        """Mask whose bounding box best IoU-matches the prompt box."""
        b = np.asarray(self.result.boxes.xyxy)
        if not len(b):
            return np.zeros(self.shape, bool)
        p = np.asarray(box_xyxy, np.float32)
        tl = np.maximum(b[:, :2], p[:2])
        br = np.minimum(b[:, 2:], p[2:])
        inter = np.clip(br - tl, 0, None).prod(-1)
        union = (
            (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            + (p[2] - p[0]) * (p[3] - p[1])
            - inter
        )
        best = int(np.argmax(inter / (union + 1e-9)))
        return _mask_to_fullres(self.result.masks[best], self.shape)

    def point_prompt(
        self, points: Sequence[Sequence[float]], labels: Optional[Sequence[int]] = None
    ) -> np.ndarray:
        """Union of masks containing the positive points, minus negatives."""
        labels = list(labels) if labels is not None else [1] * len(points)
        out = np.zeros(self.shape, bool)
        full = self.everything()
        for (x, y), l in zip(points, labels):
            xi = int(np.clip(x, 0, self.shape[1] - 1))
            yi = int(np.clip(y, 0, self.shape[0] - 1))
            hit = [i for i in range(len(full)) if full[i, yi, xi]]
            for i in hit:
                if l == 1:
                    out |= full[i]
                else:
                    out &= ~full[i]
        return out

    def text_prompt(self, text: str, embed_fn=None) -> np.ndarray:
        """Mask of the detection whose class name best matches the text.

        `embed_fn(list_of_strings) -> (K, D)` defaults to the framework's
        text-embedding table (CLIP when available, hash fallback otherwise).
        """
        if embed_fn is None:
            from tamtr_tpu.data.text import class_text_embeddings

            embed_fn = class_text_embeddings
        names = [self.result.names[int(l)] for l in self.result.boxes.cls]
        if not names:
            return np.zeros(self.shape, bool)
        embs = embed_fn(list(dict.fromkeys(names)) + [text])
        name_keys = list(dict.fromkeys(names))
        sims = embs[:-1] @ embs[-1]
        best_name = name_keys[int(np.argmax(sims))]
        idxs = [i for i, n in enumerate(names) if n == best_name]
        best = max(idxs, key=lambda i: float(self.result.boxes.conf[i]))
        return _mask_to_fullres(self.result.masks[best], self.shape)
