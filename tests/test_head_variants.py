"""Ablation decoder variants: Decoupling / DecouplingDFL / ManbaDecoder."""

import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

from tamtr_tpu.nn.graph import TAMTRModel


def _variant_yaml(head: str, tmp: Path) -> Path:
    """Nano graph with the requested head type."""
    src = Path("tamtr_tpu/cfg/models/tamtr-nano.yaml").read_text()
    extra = ", true" if "World" in head else ""
    src = src.replace(
        "- [[32, 36, 40], 1, ManbaWorldDecoder, [nc, 128, 20, 4, 8, 3]]",
        f"- [[32, 36, 40], 1, {head}, [nc, 128, 20, 4, 8, 3{extra}]]",
    )
    p = tmp / f"{head}.yaml"
    p.write_text(src)
    return p


@pytest.mark.parametrize(
    "head,uses_text",
    [
        ("DecouplingManbaWorldDecoder", True),
        ("DecouplingDFLManbaWorldDecoder", True),
        ("ManbaDecoder", False),
    ],
)
def test_variant_head_train_and_eval(tmp_path, head, uses_text):
    model = TAMTRModel.from_yaml(
        _variant_yaml(head, tmp_path), nc=5, max_gt=4, scan_chunk=16, num_denoising=4
    )
    assert model.head_type == head and model.uses_text == uses_text
    B, M, sz, hd = 1, 4, 64, 128
    img = jnp.zeros((B, sz, sz, 3))
    txt = jnp.zeros((B, 5, hd))
    targets = {
        "cls": jnp.zeros((B, M), jnp.int32),
        "bboxes": jnp.full((B, M, 4), 0.5),
        "mask": jnp.tile(jnp.arange(M)[None] < 2, (B, 1)),
    }
    k = jax.random.PRNGKey(0)
    v = jax.jit(
        lambda: model.init({"params": k, "cdn": k, "dropout": k}, img, txt, targets, True)
    )()
    out, _ = model.apply(
        v, img, txt, targets, True, rngs={"cdn": k, "dropout": k}, mutable=["batch_stats"]
    )
    num_dn = out["num_dn"]
    assert out["dec_scores"].shape == (3, B, num_dn + 20, 5)
    assert out["dec_bboxes"].shape == (3, B, num_dn + 20, 4)
    assert bool(jnp.isfinite(out["dec_scores"]).all())
    if head.startswith("Decoupling"):
        # decoupled layers carry two streams: box cross-attn params exist
        layer0 = v["params"]["head"]["layer0"]
        assert "cross_attn_cls" in layer0 and "cross_attn_box" in layer0
        if head == "DecouplingDFLManbaWorldDecoder":
            assert "self_attn2" in layer0
    ev = model.apply(v, img, txt, None, False)
    assert ev["pred"].shape == (B, 20, 4 + 5)


def test_location_manba_decoder(tmp_path):
    model = TAMTRModel.from_yaml(
        _variant_yaml("locationManbaDecoder", tmp_path), nc=5, max_gt=4,
        scan_chunk=16, num_denoising=4,
    )
    B, M, sz, hd = 1, 4, 64, 128
    img = jnp.zeros((B, sz, sz, 3))
    txt = jnp.zeros((B, 5, 512))  # 2-D contrastive heads project to embed=512
    targets = {
        "cls": jnp.zeros((B, M), jnp.int32),
        "bboxes": jnp.full((B, M, 4), 0.5),
        "mask": jnp.tile(jnp.arange(M)[None] < 2, (B, 1)),
    }
    k = jax.random.PRNGKey(0)
    v = jax.jit(
        lambda: model.init({"params": k, "cdn": k, "dropout": k}, img, txt, targets, True)
    )()
    out, _ = model.apply(
        v, img, txt, targets, True, rngs={"cdn": k, "dropout": k}, mutable=["batch_stats"]
    )
    num_dn = out["num_dn"]
    assert out["dec_bboxes"].shape == (3, B, num_dn + 20, 4)
    # single score set broadcast across layers; dn slots zero-padded
    assert out["dec_scores"].shape == (3, B, num_dn + 20, 5)
    ev = model.apply(v, img, txt, None, False)
    assert ev["pred"].shape == (B, 20, 4 + 5)
    assert bool(jnp.isfinite(ev["pred"]).all())


def test_dual_rtdetr_decoder(tmp_path):
    # dual head needs an even number of feature levels; reuse nano wiring
    # with levels [32, 36] x2 (4 inputs, two groups of two)
    src = Path("tamtr_tpu/cfg/models/tamtr-nano.yaml").read_text()
    src = src.replace(
        "- [[32, 36, 40], 1, ManbaWorldDecoder, [nc, 128, 20, 4, 8, 3]]",
        "- [[32, 36, 32, 36], 1, DualRTDETRDecoder, [nc, 128, 20, 4, 8, 3]]",
    )
    p = tmp_path / "dual.yaml"
    p.write_text(src)
    model = TAMTRModel.from_yaml(p, nc=5, max_gt=4, scan_chunk=16, num_denoising=4)
    B, M, sz = 1, 4, 64
    img = jnp.zeros((B, sz, sz, 3))
    txt = jnp.zeros((B, 5, 128))
    targets = {
        "cls": jnp.zeros((B, M), jnp.int32),
        "bboxes": jnp.full((B, M, 4), 0.5),
        "mask": jnp.tile(jnp.arange(M)[None] < 2, (B, 1)),
    }
    k = jax.random.PRNGKey(0)
    v = jax.jit(
        lambda: model.init({"params": k, "cdn": k, "dropout": k}, img, txt, targets, True)
    )()
    out, _ = model.apply(
        v, img, txt, targets, True, rngs={"cdn": k, "dropout": k}, mutable=["batch_stats"]
    )
    o1, o2 = out["dual"]
    assert o1["dec_bboxes"].shape == o2["dec_bboxes"].shape
    ev = model.apply(v, img, txt, None, False)
    assert isinstance(ev["pred"], list) and len(ev["pred"]) == 2
