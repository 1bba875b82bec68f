"""End-to-end model graph tests (tiny image sizes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tamtr_tpu.nn.graph import TAMTRModel, load_model_yaml, parse_graph


@pytest.fixture(scope="module")
def tiny_model():
    model = TAMTRModel.from_yaml("tamtr.yaml", nc=10, max_gt=8, scan_chunk=32)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    txt = jnp.zeros((1, 10, 512), jnp.float32)
    targets = {
        "cls": jnp.zeros((1, 8), jnp.int32),
        "bboxes": jnp.full((1, 8, 4), 0.5, jnp.float32),
        "mask": jnp.ones((1, 8), bool).at[0, 4:].set(False),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "cdn": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        img,
        txt,
        targets,
        True,
    )
    return model, variables, img, txt, targets


def test_parse_graph():
    cfg = load_model_yaml("tamtr.yaml")
    specs, head_spec, save, nc, head_type = parse_graph(cfg, nc=10)
    assert nc == 10
    assert len(specs) == 41
    assert head_spec[0] == (32, 36, 40)
    assert 32 in save and 36 in save and 40 in save


def test_train_forward(tiny_model):
    model, variables, img, txt, targets = tiny_model
    out, mutated = model.apply(
        variables,
        img,
        txt,
        targets,
        True,
        rngs={"cdn": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    ndl = 3
    num_dn = out["num_dn"]
    nq = 100
    assert out["dec_bboxes"].shape == (ndl, 1, num_dn + nq, 4)
    assert out["dec_scores"].shape == (ndl, 1, num_dn + nq, 10)
    assert out["enc_bboxes"].shape == (1, nq, 4)
    assert out["enc_scores"].shape == (1, nq, 10)
    for k in ("dec_bboxes", "dec_scores", "enc_bboxes", "enc_scores"):
        assert np.all(np.isfinite(np.asarray(out[k]))), k
    assert "batch_stats" in mutated


def test_eval_forward(tiny_model):
    model, variables, img, txt, _ = tiny_model
    out = model.apply(variables, img, txt, None, False)
    assert out["pred"].shape == (1, 100, 14)  # 4 + nc sigmoid scores
    pred = np.asarray(out["pred"])
    assert np.all(np.isfinite(pred))
    assert (pred[..., 4:] >= 0).all() and (pred[..., 4:] <= 1).all()


def test_rtdetr_variant_forward():
    """Text-free RT-DETR twin: plain Linear score heads, no TIAGELAN."""
    model = TAMTRModel.from_yaml("rtdetr.yaml", nc=5, max_gt=8, scan_chunk=32)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    txt = jnp.zeros((1, 5, 512), jnp.float32)  # ignored by the Linear heads
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "cdn": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        img, txt, None, False,
    )
    out = model.apply(variables, img, txt, None, False)
    assert out["pred"].shape == (1, 300, 9)  # 4 + nc; nq=300 (reference RT-DETR)
    assert np.all(np.isfinite(np.asarray(out["pred"])))
