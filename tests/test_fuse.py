"""RepConvN deploy fusion: fused single-conv params must reproduce the
train-layout eval forward exactly (reference `switch_to_deploy`,
`extra_modules/block.py:103-126`)."""

import numpy as np
import jax
import jax.numpy as jnp

from tamtr_tpu.nn.fuse import fuse_repconv_variables
from tamtr_tpu.nn.layers import RepConvN, RepNCSPELAN4


def _randomize_bn(variables, rng):
    """Give BN stats/affine non-trivial values so folding is actually tested."""

    def walk(node, path=()):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        leafname = path[-1]
        if leafname in ("mean", "bias"):
            return jnp.asarray(rng.normal(0, 0.3, node.shape), jnp.float32)
        if leafname == "var":
            return jnp.asarray(rng.uniform(0.5, 2.0, node.shape), jnp.float32)
        if leafname == "scale":
            return jnp.asarray(rng.uniform(0.5, 1.5, node.shape), jnp.float32)
        return node

    return walk(variables)


def test_repconvn_fusion_exact():
    rng = np.random.default_rng(0)
    m_train = RepConvN(8)
    m_deploy = RepConvN(8, deploy=True)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
    v = m_train.init(jax.random.PRNGKey(0), x)
    v = _randomize_bn(v, rng)
    y_ref = m_train.apply(v, x, False)
    v_fused = fuse_repconv_variables(v)
    assert "batch_stats" in v_fused and v_fused["batch_stats"] == {}
    y_fused = m_deploy.apply({"params": v_fused["params"]}, x, False)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fused), atol=2e-5)


def test_elan_block_fusion_exact():
    rng = np.random.default_rng(1)
    m_train = RepNCSPELAN4(16, 16, 8, n=1)
    m_deploy = RepNCSPELAN4(16, 16, 8, n=1, deploy=True)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 12)), jnp.float32)
    v = m_train.init(jax.random.PRNGKey(0), x)
    v = _randomize_bn(v, rng)
    y_ref = m_train.apply(v, x, False)
    v_fused = fuse_repconv_variables(v)
    # non-RepConv BN stats must survive for the remaining ConvBN layers
    assert v_fused["batch_stats"], "plain ConvBN stats should remain"
    y_fused = m_deploy.apply(
        {"params": v_fused["params"], "batch_stats": v_fused["batch_stats"]}, x, False
    )
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fused), atol=2e-5)


def test_graph_deploy_flag():
    """Full model graph builds and runs in deploy layout with fused params."""
    from tamtr_tpu.nn.graph import TAMTRModel

    model = TAMTRModel.from_yaml("yolo-gelan.yaml", nc=3)
    model_deploy = TAMTRModel.from_yaml("yolo-gelan.yaml", nc=3, deploy=True)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    txt = jnp.zeros((1, 3, 512), jnp.float32)
    v = jax.jit(lambda: model.init(jax.random.PRNGKey(0), img, txt, None, False))()
    y_ref = jax.jit(lambda v: model.apply(v, img, txt, None, False))(v)
    v_fused = fuse_repconv_variables(jax.device_get(v))
    y_fused = jax.jit(lambda v: model_deploy.apply(v, img, txt, None, False))(v_fused)
    ref, fused = jax.tree_util.tree_leaves(y_ref), jax.tree_util.tree_leaves(y_fused)
    for a, b in zip(ref, fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
