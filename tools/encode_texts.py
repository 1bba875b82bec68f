#!/usr/bin/env python
"""Offline CLIP text-embedding table generator.

The reference encodes class texts with a frozen CLIP ViT-B/32 at runtime
(`/root/reference/ultralytics/models/rtdetrworld/train.py:95-157`,
`nn/tasks.py:552-572`). The TPU-native design precomputes the table once —
this tool — and the trainer/validator gather from it (hot-loop #4 removed).

Usage:
  # classes from a dataset yaml (synonyms split on "/", all encoded):
  python tools/encode_texts.py --data dataset/visdrone.yaml --out visdrone_clip.npz

  # or explicit texts:
  python tools/encode_texts.py --texts pedestrian people bicycle car "" --out t.npz

  # checkpoint sources, tried in order:
  #   --model <hf-name-or-path>  transformers CLIPTextModelWithProjection
  #                              (local_files_only; e.g. a downloaded
  #                              openai/clip-vit-base-patch32 directory)
  #   --torch-pt <ViT-B-32.pt>   OpenAI-format torchscript CLIP archive
  # This environment has no network egress: download a checkpoint elsewhere
  # and mount/copy it, then run this tool.

The output npz has keys "texts" (K,) and "embeddings" (K, 512) L2-normalized,
consumed by `tamtr_tpu.data.text` (cfg key `text_embeddings=<file>`).
The padding text "" is always included (RandomLoadText pads with it).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_clip_tokenizer(model_name="openai/clip-vit-base-patch32"):
    """Load the CLIP BPE tokenizer (transformers' copy of the same vocab)."""
    from transformers import CLIPTokenizer

    return CLIPTokenizer.from_pretrained(model_name, local_files_only=True)


def tokenize_texts(texts, tokenizer, max_length=77):
    """Texts -> (K, 77) int ids, OpenAI-CLIP compatible.

    Pads with the EOT token (transformers' CLIP pad token IS endoftext), so
    the torchscript tower's `argmax(ids)` EOT-pooling — which returns the
    FIRST occurrence of the max id — still picks the true EOT position.
    """
    enc = tokenizer(
        list(texts), padding="max_length", max_length=max_length,
        truncation=True, return_tensors="pt",
    )
    return enc["input_ids"]


def encode_transformers(texts, model_name, tokenizer=None, model=None):
    """transformers CLIPTextModelWithProjection path (hf checkpoint dir)."""
    import torch

    tok = tokenizer or load_clip_tokenizer(model_name)
    if model is None:
        from transformers import CLIPTextModelWithProjection

        model = CLIPTextModelWithProjection.from_pretrained(
            model_name, local_files_only=True
        )
    model.eval()
    with torch.no_grad():
        inputs = tok(list(texts), padding=True, return_tensors="pt")
        emb = model(**inputs).text_embeds.float().numpy()
    return emb


def encode_openai_pt(texts, pt_path, tokenizer=None, model=None):
    """OpenAI CLIP torchscript archive (ViT-B-32.pt): run the text tower.

    Mirrors the reference `clip.encode_text` call
    (`/root/reference/ultralytics/nn/tasks.py:552-572`) via the archive's
    exported `encode_text` method.
    """
    import torch

    if model is None:
        model = torch.jit.load(pt_path, map_location="cpu").float().eval()
    ids = tokenize_texts(texts, tokenizer or load_clip_tokenizer())
    with torch.no_grad():
        emb = model.encode_text(ids).float().numpy()
    return emb


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", help="dataset yaml with a names: table")
    ap.add_argument("--texts", nargs="*", help="explicit texts to encode")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--model", default="openai/clip-vit-base-patch32",
                    help="transformers CLIP checkpoint (local)")
    ap.add_argument("--torch-pt", default=None,
                    help="OpenAI-format CLIP .pt archive (e.g. ~/.cache/clip/ViT-B-32.pt)")
    ap.add_argument("--allow-hash", action="store_true",
                    help="fall back to hash stand-ins if no checkpoint is "
                         "available (NOT suitable for parity runs)")
    args = ap.parse_args(argv)

    texts = list(args.texts or [])
    if args.data:
        from tamtr_tpu.config import load_data_yaml

        # check=False: encoding only needs the names table, not split paths
        names = load_data_yaml(args.data, check=False)["names"]
        for n in names:
            for syn in str(n).split("/"):
                if syn not in texts:
                    texts.append(syn)
    if "" not in texts:
        texts.append("")  # RandomLoadText padding text
    if not texts:
        ap.error("nothing to encode: pass --data and/or --texts")

    emb = None
    errors = []
    if args.torch_pt and Path(args.torch_pt).expanduser().exists():
        try:
            emb = encode_openai_pt(texts, str(Path(args.torch_pt).expanduser()))
        except Exception as e:  # noqa: BLE001
            errors.append(f"torch-pt: {e}")
    if emb is None:
        try:
            emb = encode_transformers(texts, args.model)
        except Exception as e:  # noqa: BLE001
            errors.append(f"transformers({args.model}): {e}")
    if emb is None:
        if not args.allow_hash:
            print("ERROR: no CLIP checkpoint available.", file=sys.stderr)
            for e in errors:
                print(f"  - {e}", file=sys.stderr)
            print(
                "Download openai/clip-vit-base-patch32 (or ViT-B-32.pt) on a "
                "machine with network access, copy it here, and re-run. "
                "Use --allow-hash only for smoke tests.",
                file=sys.stderr,
            )
            return 1
        from tamtr_tpu.data.text import _hash_embedding

        emb = np.stack([_hash_embedding(t) for t in texts])
    emb = np.asarray(emb, np.float32)
    emb = emb / np.clip(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12, None)
    np.savez(args.out, texts=np.array(texts, dtype=object), embeddings=emb)
    print(f"wrote {args.out}: {len(texts)} texts, dim {emb.shape[1]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
