"""Frozen text embeddings for the open-vocabulary branch.

The reference loads a frozen CLIP ViT-B/32 per rank and tokenizes/encodes
class texts every batch (`models/rtdetrworld/train.py:95-157`) — hot-loop #4
in SURVEY.md §3. The TPU-native design precomputes the embedding table once
(the BASELINE.json north star) with `tools/encode_texts.py` and gathers from
it per batch; `set_classes` just swaps the table.

Sources, in priority order:
1. an `.npz` file produced offline by `tools/encode_texts.py` with a real
   CLIP checkpoint — keys "texts" (K,) strings and "embeddings" (K, 512)
   (legacy files with only "embeddings" are matched by position);
2. a local `transformers` or OpenAI-format CLIP checkpoint, if one exists;
3. deterministic hash-based unit vectors — a stand-in that keeps the whole
   pipeline trainable end-to-end (per-class distinctness is preserved, CLIP
   semantics are NOT). This fallback logs a loud warning: mAP parity runs
   REQUIRE real embeddings.
"""

from __future__ import annotations

import hashlib
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from tamtr_tpu.utils.log import LOGGER

EMBED_DIM = 512
_WARNED = False


def _warn_hash_fallback(texts: Sequence[str]) -> None:
    global _WARNED
    if not _WARNED:
        LOGGER.warning(
            "TEXT EMBEDDINGS ARE HASH STAND-INS (no CLIP checkpoint / npz table "
            f"found for {list(texts)[:4]}...). The text branch is semantically "
            "void: detection still trains, but open-vocabulary behavior and "
            "mAP parity with the reference require real CLIP ViT-B/32 "
            "embeddings. Generate them offline with tools/encode_texts.py "
            "and pass text_embeddings=<file.npz>."
        )
        _WARNED = True


def _hash_embedding(text: str, dim: int = EMBED_DIM) -> np.ndarray:
    seed = int.from_bytes(hashlib.sha256(text.encode()).digest()[:8], "little")
    v = np.random.default_rng(seed).standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def _load_npz_table(npz_path: str | Path) -> Optional[Dict[str, np.ndarray]]:
    """{text: (512,) embedding} from an encode_texts.py npz."""
    p = Path(npz_path)
    if not p.exists():
        return None
    z = np.load(p, allow_pickle=True)
    emb = np.asarray(z["embeddings"], np.float32)
    emb = emb / np.clip(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12, None)
    if "texts" in z:
        texts = [str(t) for t in z["texts"]]
        return dict(zip(texts, emb))
    return {f"__pos{i}__": e for i, e in enumerate(emb)}


def encode_texts(
    texts: Sequence[str],
    npz_path: Optional[str | Path] = None,
    clip_model: Optional[str] = None,
) -> np.ndarray:
    """(K, 512) L2-normalized embeddings for arbitrary text strings.

    Looks up the npz table (by text, or by position for legacy
    embeddings-only files), then a local CLIP checkpoint, then hash
    stand-ins (with a loud warning)."""
    out = np.zeros((len(texts), EMBED_DIM), np.float32)
    missing: List[int] = []
    table = _load_npz_table(npz_path) if npz_path is not None else None
    if table is not None:
        positional = "__pos0__" in table
        for i, t in enumerate(texts):
            key = f"__pos{i}__" if positional else t
            if key in table:
                out[i] = table[key]
            else:
                missing.append(i)
        if not missing:
            return out
    else:
        missing = list(range(len(texts)))
    missing_texts = [texts[i] for i in missing]
    if clip_model is not None:
        try:
            emb = _encode_with_transformers(missing_texts, clip_model)
            if emb is not None:
                out[np.asarray(missing)] = emb
                return out
        except Exception:
            pass
    _warn_hash_fallback(missing_texts)
    for i in missing:
        out[i] = _hash_embedding(texts[i])
    return out


def class_text_embeddings(
    names: Sequence[str],
    npz_path: Optional[str | Path] = None,
    clip_model: Optional[str] = None,
) -> np.ndarray:
    """(K, 512) L2-normalized text embeddings for the class names.

    Multi-synonym names ("person/pedestrian") use the FIRST synonym, the
    reference's eval behavior (its val texts come from the names table)."""
    first = [str(n).split("/")[0] for n in names]
    return encode_texts(first, npz_path=npz_path, clip_model=clip_model)


class TextEmbedder:
    """Text -> embedding lookup with caching, for per-batch RandomLoadText.

    Replaces the reference's per-batch CLIP tokenize+encode
    (`rtdetrworld/train.py:134-157`) with a host-side table gather; unseen
    texts are embedded on first use (npz/CLIP/hash) and cached.
    """

    def __init__(
        self,
        npz_path: Optional[str | Path] = None,
        clip_model: Optional[str] = None,
    ) -> None:
        self.npz_path = npz_path
        self.clip_model = clip_model
        self._cache: Dict[str, np.ndarray] = {}

    def __call__(self, batch_texts: Sequence[Sequence[str]]) -> np.ndarray:
        """(B, K) strings -> (B, K, 512) embeddings."""
        new = sorted({t for row in batch_texts for t in row} - self._cache.keys())
        if new:
            emb = encode_texts(new, npz_path=self.npz_path, clip_model=self.clip_model)
            self._cache.update(zip(new, emb))
        return np.stack(
            [np.stack([self._cache[t] for t in row]) for row in batch_texts]
        ).astype(np.float32)


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
