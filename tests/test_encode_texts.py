"""Unit tests for tools/encode_texts.py with fake tokenizer/model objects.

No CLIP checkpoint exists in this image (zero egress), so both encode paths
are exercised through their injectable seams (`tokenizer=`/`model=`),
covering the exact call contract the real objects implement
(reference runtime path: `ultralytics/nn/tasks.py:552-572`).
"""

import sys
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.encode_texts import encode_openai_pt, encode_transformers, tokenize_texts

EOT = 49407


class FakeTokenizer:
    """Mimics transformers.CLIPTokenizer: BOS + per-char ids + EOT, padded
    with EOT (the real CLIP pad token IS endoftext)."""

    def __call__(self, texts, padding=None, max_length=77, truncation=False,
                 return_tensors="pt"):
        rows = []
        for t in texts:
            ids = [49406] + [ord(c) % 1000 for c in t][: max_length - 2] + [EOT]
            if padding == "max_length":
                ids = ids + [EOT] * (max_length - len(ids))
            rows.append(ids)
        if padding is True or padding == "longest":
            width = max(len(r) for r in rows)
            rows = [r + [EOT] * (width - len(r)) for r in rows]
        return {"input_ids": torch.tensor(rows, dtype=torch.long)}


class FakeOpenAIModel:
    """Mimics the torchscript archive: encode_text(ids) -> (K, 512)."""

    def encode_text(self, ids):
        assert ids.shape[1] == 77, "OpenAI CLIP expects 77-token context"
        # EOT pooling exactly like the real tower: argmax finds the FIRST
        # occurrence of the max id (= the true EOT, since pads are also EOT)
        eot_pos = ids.argmax(dim=-1)
        out = torch.zeros(ids.shape[0], 512)
        out[:, 0] = eot_pos.float()
        out[:, 1] = ids.float().sum(-1)
        return out


class FakeHFModel:
    """Mimics CLIPTextModelWithProjection: model(**inputs).text_embeds."""

    def eval(self):
        return self

    def __call__(self, input_ids=None, **kw):
        class Out:
            text_embeds = torch.ones(input_ids.shape[0], 512) * input_ids.float().mean()

        return Out()


def test_tokenize_pads_with_eot_and_argmax_finds_true_eot():
    ids = tokenize_texts(["car", "pedestrian"], FakeTokenizer())
    assert ids.shape == (2, 77)
    # pad region is EOT; argmax (first max) must land on the true EOT
    assert ids[0, 4] == EOT and ids[0, 76] == EOT
    assert ids[0].argmax().item() == 4  # BOS + 3 chars -> EOT at index 4
    assert ids[1].argmax().item() == 11


def test_encode_openai_pt_path_with_fakes():
    emb = encode_openai_pt(
        ["car", "van", ""], pt_path=None,
        tokenizer=FakeTokenizer(), model=FakeOpenAIModel(),
    )
    assert emb.shape == (3, 512)
    # fake encodes EOT position in dim 0: "car" -> 4, "van" -> 4, "" -> 1
    assert emb[0, 0] == 4 and emb[2, 0] == 1


def test_encode_transformers_path_with_fakes():
    emb = encode_transformers(
        ["car", "bicycle"], model_name="unused",
        tokenizer=FakeTokenizer(), model=FakeHFModel(),
    )
    assert emb.shape == (2, 512)
    assert np.isfinite(emb).all()


def test_main_writes_normalized_npz(tmp_path):
    from tools import encode_texts

    out = tmp_path / "t.npz"
    rc = encode_texts.main(["--texts", "car", "van", "--out", str(out), "--allow-hash"])
    assert rc == 0
    data = np.load(out, allow_pickle=True)
    texts = list(data["texts"])
    assert texts[-1] == ""  # padding text always appended
    norms = np.linalg.norm(data["embeddings"], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
