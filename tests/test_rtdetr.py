"""RT-DETR facade parity: AIFI sincos + RTDETRDecoder head shapes/training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tamtr_tpu.nn.graph import TAMTRModel
from tamtr_tpu.nn.layers import AIFI


def test_aifi_sincos_matches_reference_formula():
    """Golden: the 2-D sincos layout of `transformer.py:89-104`."""
    w, h, dim = 3, 2, 8
    pos = np.asarray(AIFI.sincos_2d(w, h, dim))[0]  # (w*h, dim)
    pos_dim = dim // 4
    omega = 1.0 / (10000.0 ** (np.arange(pos_dim) / pos_dim))
    # token order: (w, h) 'ij' meshgrid flattened -> index = wi * h + hi
    for wi in range(w):
        for hi in range(h):
            i = wi * h + hi
            np.testing.assert_allclose(pos[i, :pos_dim], np.sin(wi * omega), rtol=1e-6)
            np.testing.assert_allclose(pos[i, pos_dim:2 * pos_dim], np.cos(wi * omega), rtol=1e-6)
            np.testing.assert_allclose(pos[i, 2 * pos_dim:3 * pos_dim], np.sin(hi * omega), rtol=1e-6)
            np.testing.assert_allclose(pos[i, 3 * pos_dim:], np.cos(hi * omega), rtol=1e-6)


def test_aifi_shape_preserving():
    aifi = AIFI(cm=64, num_heads=4)
    x = jnp.ones((2, 4, 6, 16))
    v = aifi.init(jax.random.PRNGKey(0), x)
    y = aifi.apply(v, x)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())


@pytest.fixture(scope="module")
def rtdetr_model():
    return TAMTRModel.from_yaml("rtdetr.yaml", nc=7, max_gt=8, num_denoising=8, scan_chunk=32)


def test_rtdetr_eval_forward(rtdetr_model):
    model = rtdetr_model
    assert model.head_type == "RTDETRDecoder" and not model.uses_text
    img = jnp.zeros((1, 64, 64, 3))
    txt = jnp.zeros((1, 7, 256))  # unused by Linear heads but part of the API
    k = jax.random.PRNGKey(0)
    v = jax.jit(lambda: model.init({"params": k, "cdn": k, "dropout": k}, img, txt, None, False))()
    out = jax.jit(lambda v: model.apply(v, img, txt, None, False))(v)
    # nq=300 queries, 4 + nc channels
    assert out["pred"].shape == (1, 300, 4 + 7)
    assert bool(jnp.isfinite(out["pred"]).all())
    # no VSS params in the plain RT-DETR head
    assert not any(k.startswith("vss") for k in v["params"]["head"])
    # AIFI params present in the graph
    assert any("AIFI" in k for k in v["params"])


def test_rtdetr_train_outputs(rtdetr_model):
    model = rtdetr_model
    B, M = 2, 8
    img = jnp.zeros((B, 64, 64, 3))
    txt = jnp.zeros((B, 7, 256))
    targets = {
        "cls": jnp.zeros((B, M), jnp.int32),
        "bboxes": jnp.full((B, M, 4), 0.5),
        "mask": jnp.tile(jnp.arange(M)[None] < 3, (B, 1)),
    }
    k = jax.random.PRNGKey(0)
    v = jax.jit(
        lambda: model.init({"params": k, "cdn": k, "dropout": k}, img, txt, targets, True)
    )()
    out = model.apply(
        v, img, txt, targets, True, rngs={"cdn": k, "dropout": k}, mutable=["batch_stats"]
    )[0]
    ndl, num_dn = 6, out["num_dn"]
    assert out["dec_scores"].shape == (ndl, B, num_dn + 300, 7)
    assert out["dec_bboxes"].shape == (ndl, B, num_dn + 300, 4)
