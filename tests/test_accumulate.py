"""Gradient-accumulation cadence tests vs the reference update rule.

Reference semantics (`/root/reference/ultralytics/engine/trainer.py:330-347,
471-479`): gradients sum across minibatches; the optimizer steps when
`ni - last_opt_step >= accumulate`, where during warmup
`accumulate = max(1, round(interp(ni, [0, nw], [1, nbs/bs])))`.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tamtr_tpu.train.trainer import FlatOptState, TrainConfig, make_optimizer

PARAMS = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}}


def _reference_step_indices(n_iters, nbs, bs, nw):
    """Simulate the reference trainer's cadence; returns minibatch indices
    at which the optimizer stepped."""
    last_opt = -1
    steps = []
    for ni in range(n_iters):
        accumulate = max(1, round(float(np.interp(ni, [0, nw], [1, nbs / bs]))))
        if ni - last_opt >= accumulate:
            steps.append(ni)
            last_opt = ni
    return steps


def _run_optimizer_cadence(cfg, n_iters):
    tx = make_optimizer(cfg, PARAMS, steps_per_epoch=100)
    opt = tx.init(PARAMS)
    from jax.flatten_util import ravel_pytree

    g, _ = ravel_pytree(jax.tree.map(jnp.ones_like, PARAMS))
    p = jnp.zeros_like(g)
    steps = []
    for ni in range(n_iters):
        _, new_opt = jax.jit(tx.update)(g, opt, p)
        if int(new_opt.count) > int(opt.count):
            steps.append(ni)
        opt = new_opt
    return steps


def test_reference_cadence_batch6():
    """batch 6, nbs 64 (the TAM-TR recipe): accumulate ramps 1 -> 11."""
    cfg = TrainConfig(batch_size=6, nbs=64, warmup_iters=40, epochs=10)
    ours = _run_optimizer_cadence(cfg, 120)
    ref = _reference_step_indices(120, 64, 6, 40)
    assert ours == ref, f"cadence mismatch: ours={ours} ref={ref}"
    # post-warmup cadence is every 11 minibatches
    post = [s for s in ref if s > 60]
    assert all(b - a == 11 for a, b in zip(post, post[1:]))


def test_reference_cadence_batch2():
    cfg = TrainConfig(batch_size=2, nbs=8, warmup_iters=6, epochs=10)
    ours = _run_optimizer_cadence(cfg, 30)
    ref = _reference_step_indices(30, 8, 2, 6)
    assert ours == ref


def test_accumulation_sums_gradients():
    """Two minibatches with accumulate=2 equal one step on the summed grad."""
    cfg = TrainConfig(batch_size=2, nbs=4, accumulate=2, warmup_iters=1, epochs=10)
    tx = make_optimizer(cfg, PARAMS, steps_per_epoch=10)
    opt = tx.init(PARAMS)
    from jax.flatten_util import ravel_pytree

    g1 = jnp.full_like(opt.m, 0.01)
    g2 = jnp.full_like(opt.m, 0.03)
    p = jnp.zeros_like(opt.m)

    upd1, opt1 = tx.update(g1, opt, p)
    assert int(opt1.count) == 0  # no step yet
    np.testing.assert_array_equal(np.asarray(upd1), 0.0)
    np.testing.assert_allclose(np.asarray(opt1.acc), np.asarray(g1))

    upd2, opt2 = tx.update(g2, opt1, p)
    assert int(opt2.count) == 1
    np.testing.assert_allclose(np.asarray(opt2.acc), 0.0)
    # first moment built from the summed gradient (norm << clip => unclipped)
    expected_m = (1.0 - cfg.momentum) * np.asarray(g1 + g2)
    np.testing.assert_allclose(np.asarray(opt2.m), expected_m, rtol=1e-6)
    assert np.all(np.asarray(upd2) != 0.0)


def test_momentum_warmup_beta1():
    """momentum_warmup=True ramps beta1 from warmup_momentum at ni=0."""
    cfg = TrainConfig(
        batch_size=2, nbs=2, warmup_iters=10, momentum_warmup=True,
        warmup_momentum=0.8, momentum=0.937, epochs=10,
    )
    tx = make_optimizer(cfg, PARAMS, steps_per_epoch=10)
    opt = tx.init(PARAMS)
    # grads live only in the REAL param region; the flat-vector pad (see
    # trainer.PAD_MULTIPLE) must stay zero or it inflates the clip norm
    from jax.flatten_util import ravel_pytree

    g_real, _ = ravel_pytree(jax.tree.map(lambda x: jnp.full_like(x, 0.5), PARAMS))
    p = jnp.zeros_like(g_real)
    upd, opt1 = tx.update(g_real, opt, p)  # steps at ni=0 (accumulate target 1)
    assert int(opt1.count) == 1
    assert upd.shape == g_real.shape  # raw-length in, raw-length out
    np.testing.assert_allclose(
        np.asarray(opt1.m[: g_real.shape[0]]), 0.2 * np.asarray(g_real), rtol=1e-5
    )


def test_ema_ticks_only_on_optimizer_steps():
    """EMA stays frozen on accumulation-only minibatches."""
    from tamtr_tpu.train.trainer import TrainState, make_train_step

    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, img, txt, targets=None, train=False):
            return {"out": nn.Dense(4)(img)}

    class Wrapper:
        def __init__(self):
            self._m = Tiny()
            self.params = self._m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)), None)[
                "params"
            ]

        def apply(self, variables, img, txt, targets, train, rngs=None, mutable=None):
            out = self._m.apply({"params": variables["params"]}, img, txt, targets, train)
            return out, {"batch_stats": {}}

    wrapper = Wrapper()
    cfg = TrainConfig(batch_size=2, nbs=4, accumulate=2, warmup_iters=1, epochs=2)
    tx = make_optimizer(cfg, wrapper.params, steps_per_epoch=2)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=wrapper.params, batch_stats={},
        opt_state=tx.init(wrapper.params), ema_params=wrapper.params,
        ema_batch_stats={},
    )

    def loss(outputs, targets):
        l = (outputs["out"] ** 2).sum()
        return l, {"bbox": l}

    batch = {
        "img": jnp.ones((2, 4)), "txt_feats": jnp.zeros((2, 1, 4)),
        "cls": jnp.zeros((2, 1), jnp.int32), "bboxes": jnp.zeros((2, 1, 4)),
        "mask": jnp.zeros((2, 1), bool),
    }
    step = make_train_step(wrapper, tx, None, cfg, loss_callable=loss)
    s1, _ = step(state, batch, jax.random.PRNGKey(0))
    # minibatch 1 of 2: no optimizer step -> params and EMA unchanged
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(s1.ema_params), jax.tree.leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s2, _ = step(s1, batch, jax.random.PRNGKey(1))
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(s2.params), jax.tree.leaves(s1.params))
    )
    assert changed and int(s2.opt_state.count) == 1
