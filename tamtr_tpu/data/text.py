"""Frozen text embeddings for the open-vocabulary branch.

The reference loads a frozen CLIP ViT-B/32 per rank and tokenizes/encodes
class texts every batch (`models/rtdetrworld/train.py:95-157`) — hot-loop #4
in SURVEY.md §3. The TPU-native design precomputes the per-class embedding
table once (the BASELINE.json north star) and ships it to device as a
constant; `set_classes` just swaps the table.

Sources, in priority order:
1. an `.npz` file with key "embeddings" (K, 512) — produced offline by
   `tools/encode_texts.py` with a real CLIP checkpoint;
2. a local `transformers` CLIP checkpoint, if one is cached;
3. deterministic hash-based unit vectors (a stand-in that keeps the whole
   pipeline trainable end-to-end; per-class distinctness is preserved, CLIP
   semantics are not — swap in real embeddings for mAP parity runs).
"""

from __future__ import annotations

import hashlib
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

EMBED_DIM = 512


def _hash_embedding(text: str, dim: int = EMBED_DIM) -> np.ndarray:
    seed = int.from_bytes(hashlib.sha256(text.encode()).digest()[:8], "little")
    v = np.random.default_rng(seed).standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def class_text_embeddings(
    names: Sequence[str],
    npz_path: Optional[str | Path] = None,
    clip_model: Optional[str] = None,
) -> np.ndarray:
    """(K, 512) L2-normalized text embeddings for the class names."""
    if npz_path is not None and Path(npz_path).exists():
        z = np.load(npz_path)
        emb = np.asarray(z["embeddings"], np.float32)
        assert emb.shape == (len(names), EMBED_DIM), (
            f"embeddings {emb.shape} != ({len(names)}, {EMBED_DIM})"
        )
        return emb / np.linalg.norm(emb, axis=-1, keepdims=True)
    if clip_model is not None:
        try:
            emb = _encode_with_transformers(names, clip_model)
            if emb is not None:
                return emb
        except Exception:
            pass
    return np.stack([_hash_embedding(n) for n in names])


def _encode_with_transformers(names: Sequence[str], model_name: str) -> Optional[np.ndarray]:
    """Offline CLIP text encoding when a local checkpoint is available."""
    try:
        import torch
        from transformers import CLIPTextModelWithProjection, CLIPTokenizer
    except ImportError:
        return None
    tok = CLIPTokenizer.from_pretrained(model_name, local_files_only=True)
    mdl = CLIPTextModelWithProjection.from_pretrained(model_name, local_files_only=True)
    with torch.no_grad():
        inputs = tok(list(names), padding=True, return_tensors="pt")
        out = mdl(**inputs).text_embeds.numpy().astype(np.float32)
    return out / np.linalg.norm(out, axis=-1, keepdims=True)
