"""Trainer unit tests: schedules, param groups, weight decay scaling, NaN guard."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from tamtr_tpu.train.trainer import (
    TrainConfig,
    TrainState,
    _bias_mask,
    _decay_mask,
    make_lr_schedules,
    make_optimizer,
    make_train_step,
)


def test_lr_warmup_and_constant():
    cfg = TrainConfig(lr0=1e-4, lrf=1.0, warmup_iters=100, warmup_bias_lr=0.1, epochs=10)
    lr_main, lr_bias = make_lr_schedules(cfg, steps_per_epoch=50)
    assert abs(float(lr_main(0))) < 1e-9
    assert abs(float(lr_bias(0)) - 0.1) < 1e-6
    np.testing.assert_allclose(float(lr_main(50)), 5e-5, rtol=1e-3)
    # lrf=1.0 => constant after warmup (the TAM-TR recipe)
    np.testing.assert_allclose(float(lr_main(100)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(lr_main(400)), 1e-4, rtol=1e-5)


def test_decay_and_bias_masks():
    params = {
        "conv": {"kernel": jnp.ones((3, 3, 8, 8)), "bias": jnp.ones((8,))},
        "bn": {"scale": jnp.ones((8,)), "bias": jnp.ones((8,))},
        "dense": {"kernel": jnp.ones((8, 4))},
    }
    dm = _decay_mask(params)
    bm = _bias_mask(params)
    assert dm["conv"]["kernel"] and not dm["conv"]["bias"]
    assert not dm["bn"]["scale"] and dm["dense"]["kernel"]
    assert bm["conv"]["bias"] and not bm["conv"]["kernel"]


def test_scaled_weight_decay():
    cfg = TrainConfig(weight_decay=1e-4, batch_size=6, nbs=64)
    # accumulate = round(64/6) = 11; wd * 6 * 11 / 64
    np.testing.assert_allclose(cfg.scaled_wd, 1e-4 * 6 * 11 / 64, rtol=1e-6)


class _TinyWrapper:
    """Minimal model with the TAMTRModel.apply signature."""

    def __init__(self):
        import flax.linen as nn

        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, img, txt, targets=None, train=False):
                return {"out": nn.Dense(4)(img)}

        self._m = Tiny()
        self.params = self._m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)), None)["params"]

    def apply(self, variables, img, txt, targets, train, rngs=None, mutable=None):
        out = self._m.apply({"params": variables["params"]}, img, txt, targets, train)
        return out, {"batch_stats": {}}


def test_nan_guard_skips_update():
    wrapper = _TinyWrapper()
    cfg = TrainConfig(warmup_iters=2, epochs=2, batch_size=2)
    tx = make_optimizer(cfg, wrapper.params, steps_per_epoch=2)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=wrapper.params, batch_stats={},
        opt_state=tx.init(wrapper.params), ema_params=wrapper.params, ema_batch_stats={},
    )

    def bad_loss(outputs, targets):
        bad = outputs["out"].sum() * jnp.nan
        return bad, {"bbox": bad}

    def good_loss(outputs, targets):
        loss = (outputs["out"] ** 2).sum()
        return loss, {"bbox": loss}

    batch = {
        "img": jnp.ones((2, 4)), "txt_feats": jnp.zeros((2, 1, 4)),
        "cls": jnp.zeros((2, 1), jnp.int32), "bboxes": jnp.zeros((2, 1, 4)),
        "mask": jnp.zeros((2, 1), bool),
    }
    step_bad = make_train_step(wrapper, tx, None, cfg, loss_callable=bad_loss)
    new_state, m = step_bad(state, batch, jax.random.PRNGKey(0))
    for a, b in zip(jax.tree.leaves(new_state.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    step_good = make_train_step(wrapper, tx, None, cfg, loss_callable=good_loss)
    new_state2, m2 = step_good(state, batch, jax.random.PRNGKey(0))
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(new_state2.params), jax.tree.leaves(state.params))
    )
    assert changed and np.isfinite(float(m2["loss"]))


@pytest.mark.slow
def test_precast_bf16_is_identity():
    """precast_bf16_params casts EXACTLY the leaves the flax modules cast
    themselves (dtype=x.dtype sites): with XLA excess precision DISABLED the
    train-step loss and grad norm are BITWISE identical with the pre-cast
    removed. (Under the default --xla_allow_excess_precision=true, XLA may
    keep f32 intermediates across different fusion boundaries, so bitwise
    comparison across graph variants is only meaningful with the flag off.)
    Catches any pattern in _bf16_consumed that wrongly covers an
    f32-consumed param (which flax would otherwise promote, changing
    semantics — e.g. the first version cast cv2_conv's BatchNorm params)."""
    import subprocess
    import sys
    from pathlib import Path

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from tamtr_tpu.losses.detr_loss import DETRLossConfig
from tamtr_tpu.nn.graph import TAMTRModel
from tamtr_tpu.train import trainer as T

B, M, nc, sz, hd = 2, 4, 5, 64, 128

def one_loss():
    model = TAMTRModel.from_yaml("tamtr-nano.yaml", nc=nc, max_gt=M,
                                 scan_chunk=32, num_denoising=4,
                                 dtype=jnp.bfloat16)
    cfg = T.TrainConfig(batch_size=B, warmup_iters=2, epochs=1, accumulate=1)
    state, tx = T.create_train_state(model, jax.random.PRNGKey(0), cfg,
                                     (B, sz, sz, 3), nc, steps_per_epoch=2,
                                     max_gt=M, text_dim=hd)
    step = jax.jit(T.make_train_step(model, tx, DETRLossConfig(nc=nc), cfg))
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.random((B, sz, sz, 3), dtype=np.float32)),
        "txt_feats": jnp.asarray(rng.standard_normal((B, nc, hd)).astype(np.float32)),
        "cls": jnp.asarray(rng.integers(0, nc, (B, M)).astype(np.int32)),
        "bboxes": jnp.asarray(np.clip(rng.random((B, M, 4)), 0.1, 0.9).astype(np.float32)),
        "mask": jnp.asarray(np.tile(np.arange(M)[None] < 3, (B, 1))),
    }
    _, m = step(state, batch, jax.random.PRNGKey(3))
    return float(m["loss"]), float(m["grad_norm"])

a = one_loss()
T.precast_bf16_params = lambda t: t
b = one_loss()
assert a == b, (a, b)
print("IDENTITY-OK", a)
"""
    import os

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_allow_excess_precision=false"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("TAMTR_JAX_CACHE", None)
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=2400,
                       cwd=str(Path(__file__).resolve().parent.parent))
    assert "IDENTITY-OK" in r.stdout, r.stdout[-1500:] + r.stderr[-1500:]
