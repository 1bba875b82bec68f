"""FSDP/ZeRO sharding of the flat train state over a 2-D ('data','model') mesh.

The reference is DP-only (SURVEY §2.5); the 'model' axis is a TPU-native
extension: flat master params / Adam moments / accumulation buffer / EMA are
sharded, the step all-gathers params once and reduce-scatters the gradient.
These tests verify (a) exact agreement with the pure-DP step, (b) the state
actually lands sharded, and (c) the flat-vector padding invariants.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tamtr_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    fsdp_size,
    make_mesh,
    replicated,
    train_state_shardings,
)
from tamtr_tpu.train.trainer import (
    PAD_MULTIPLE,
    TrainConfig,
    create_train_state,
    flatten_tree,
    make_train_step,
    padded_size,
)


class TinyDet(nn.Module):
    """Minimal conv+BN+dense model with the TAMTRModel.apply signature."""

    @nn.compact
    def __call__(self, img, txt, targets=None, train=False):
        # no conv bias before BN: that direction has ~0 true gradient and
        # Adam's rsqrt(v) turns float noise there into an O(1) random walk,
        # which would make DP-vs-FSDP comparison flaky (real ConvBN blocks
        # are bias-free for the same reason)
        x = nn.Conv(8, (3, 3), use_bias=False)(img)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x).mean((1, 2))
        return {"out": nn.Dense(6)(x)}


def _mse_loss(outputs, targets):
    loss = (outputs["out"] ** 2).mean()
    return loss, {"bbox": loss}


def _run_steps(mesh, n_steps=3, batch=8):
    model = TinyDet()
    cfg = TrainConfig(batch_size=batch, warmup_iters=2, epochs=2, accumulate=1)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), cfg, (batch, 8, 8, 3), nc=4,
        steps_per_epoch=2, max_gt=2,
    )
    step_fn = make_train_step(model, tx, None, cfg, loss_callable=_mse_loss, mesh=mesh)
    ssh = train_state_shardings(mesh, state)
    bsh = batch_sharding(mesh)
    state = jax.device_put(state, ssh)
    jit_step = jax.jit(
        step_fn, in_shardings=(ssh, bsh, None), out_shardings=(ssh, replicated(mesh)),
        donate_argnums=(0,),
    )
    rng_img = np.random.default_rng(7)
    losses = []
    for i in range(n_steps):
        host = {
            "img": rng_img.random((batch, 8, 8, 3), dtype=np.float32),
            "txt_feats": np.zeros((batch, 4, 8), np.float32),
            "cls": np.zeros((batch, 2), np.int32),
            "bboxes": np.full((batch, 2, 4), 0.5, np.float32),
            "mask": np.zeros((batch, 2), bool),
        }
        dev = jax.tree.map(lambda x: jax.device_put(x, bsh), host)
        state, m = jit_step(state, dev, jax.random.PRNGKey(100 + i))
        losses.append(float(m["loss"]))
    return state, losses


def test_fsdp_matches_dp():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    dp_state, dp_losses = _run_steps(make_mesh(8))
    fs_state, fs_losses = _run_steps(make_mesh(8, model_parallel=4))
    np.testing.assert_allclose(dp_losses, fs_losses, rtol=1e-5)
    # reduce-scatter vs all-reduce changes the reduction order; Adam's
    # rsqrt amplifies the few-ulp differences — tolerance reflects that
    np.testing.assert_allclose(
        np.asarray(dp_state.params), np.asarray(fs_state.params), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(dp_state.ema_params), np.asarray(fs_state.ema_params),
        rtol=1e-4, atol=1e-6,
    )


def test_fsdp_state_actually_sharded():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, model_parallel=4)
    assert mesh.axis_names == (DATA_AXIS, MODEL_AXIS)
    assert fsdp_size(mesh) == 4
    state, _ = _run_steps(mesh, n_steps=1)
    spec = state.params.sharding.spec
    assert spec == jax.sharding.PartitionSpec(MODEL_AXIS)
    # each device holds 1/4 of the padded flat vector
    n = state.params.shape[0]
    shard_shapes = {s.data.shape for s in state.params.addressable_shards}
    assert shard_shapes == {(n // 4,)}
    # optimizer moments and EMA are sharded too; scalars replicated
    assert state.opt_state.m.sharding.spec == spec
    assert state.ema_params.sharding.spec == spec
    assert state.opt_state.count.sharding.spec == jax.sharding.PartitionSpec()


def test_flat_padding_invariants():
    params = {"a": jnp.ones((3, 5)), "b": {"kernel": jnp.ones((7,))}}
    flat = flatten_tree(params)
    assert flat.shape[0] == padded_size(22) and flat.shape[0] % PAD_MULTIPLE == 0
    assert float(flat[:22].sum()) == 22.0
    assert float(flat[22:].sum()) == 0.0  # zero pad


def test_mesh_model_parallel_validation():
    with pytest.raises(ValueError):
        make_mesh(6, devices=jax.devices()[:6], model_parallel=4)
