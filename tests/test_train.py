"""Trainer unit tests: schedules, param groups, weight decay scaling, NaN guard."""

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
