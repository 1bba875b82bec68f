"""Auction-vs-scipy soak over REAL training-step cost matrices.

VERDICT r4 #6: the auction matcher's eps-optimality was shape-tested but not
soaked at the training distribution. This trains the nano model for N real
optimizer steps and, at every step, matches the evolving train-mode decoder
outputs with BOTH the production auction (`hungarian_match(method="auction")`)
and scipy's exact `linear_sum_assignment` oracle on the SAME cost matrices
(all decoder layers + encoder head, like the loss does), asserting

  - >= 99% identical (gt, query) pairs overall, and
  - per-image total assigned cost within 0.5% of scipy's optimum
    (the auction is eps-optimal: gap <= n_valid * eps_final).

Reference anchor: `models/utils/ops.py:114-119` (scipy LSA in the loss).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tamtr_tpu.losses.detr_loss import DETRLossConfig
from tamtr_tpu.losses.matcher import hungarian_match
from tamtr_tpu.nn.graph import TAMTRModel
from tamtr_tpu.train.trainer import TrainConfig, create_train_state, make_train_step


@pytest.mark.slow
def test_auction_matches_scipy_over_training():
    B, M, nc, sz, hd = 4, 12, 10, 64, 128
    N_STEPS = 20
    model = TAMTRModel.from_yaml(
        "tamtr-nano.yaml", nc=nc, max_gt=M, scan_chunk=32, num_denoising=0
    )
    cfg = TrainConfig(batch_size=B, warmup_iters=5, epochs=2, accumulate=1)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), cfg, (B, sz, sz, 3), nc,
        steps_per_epoch=10, max_gt=M, text_dim=hd,
    )
    step_fn = jax.jit(make_train_step(model, tx, DETRLossConfig(nc=nc), cfg),
                      donate_argnums=(0,))

    rng = np.random.default_rng(3)

    def make_batch(i):
        nv = int(rng.integers(2, M))  # varying #gts per image
        mask = np.zeros((B, M), bool)
        mask[:, :nv] = True
        return {
            "img": jnp.asarray(rng.random((B, sz, sz, 3), dtype=np.float32)),
            "txt_feats": jnp.asarray(
                rng.standard_normal((B, nc, hd)).astype(np.float32)),
            "cls": jnp.asarray(rng.integers(0, nc, (B, M)).astype(np.int32)),
            "bboxes": jnp.asarray(
                np.clip(rng.random((B, M, 4)), 0.05, 0.95).astype(np.float32)),
            "mask": jnp.asarray(mask),
        }

    @jax.jit
    def forward(state_params, state_bs, batch, rng_key):
        from tamtr_tpu.train.trainer import unravel_for_model

        out, _ = model.apply(
            {"params": state_params, "batch_stats": state_bs},
            batch["img"], batch["txt_feats"],
            {"cls": batch["cls"], "bboxes": batch["bboxes"], "mask": batch["mask"]},
            True, rngs={"cdn": rng_key, "dropout": rng_key},
            mutable=["batch_stats"],
        )
        return out

    total_pairs = 0
    agree_pairs = 0
    worst_gap = 0.0
    unravel = state.unravel
    for i in range(N_STEPS):
        batch = make_batch(i)
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(100 + i))
        assert np.isfinite(float(metrics["loss"]))
        params = unravel(state.params) if unravel else state.params
        out = forward(params, state.batch_stats, batch, jax.random.PRNGKey(7 + i))
        # batch all layers like the loss does: (ndl+1, B, nq, .) -> (L*B, ...)
        all_b = jnp.concatenate([out["enc_bboxes"][None], out["dec_bboxes"]], 0)
        all_s = jnp.concatenate([out["enc_scores"][None], out["dec_scores"]], 0)
        L = all_b.shape[0]
        pb = all_b.reshape((-1,) + all_b.shape[2:])
        ps = all_s.reshape((-1,) + all_s.shape[2:])
        gt_b = jnp.tile(batch["bboxes"], (L, 1, 1))
        gt_c = jnp.tile(batch["cls"], (L, 1))
        gt_m = jnp.tile(batch["mask"], (L, 1))
        m_auc = np.asarray(hungarian_match(pb, ps, gt_b, gt_c, gt_m, method="auction"))
        m_sci = np.asarray(hungarian_match(pb, ps, gt_b, gt_c, gt_m, method="scipy"))
        valid = np.asarray(gt_m)
        total_pairs += int(valid.sum())
        agree_pairs += int(((m_auc == m_sci) & valid).sum())
        # total-cost optimality gap per image on the raw cost matrix
        from tamtr_tpu.losses import matcher as mm

        p = jax.nn.sigmoid(ps)
        psel = jnp.take_along_axis(p, gt_c[:, None, :], axis=2)
        neg = (1 - mm.FL_ALPHA) * (psel ** mm.FL_GAMMA) * (-jnp.log(1 - psel + 1e-8))
        pos = mm.FL_ALPHA * ((1 - psel) ** mm.FL_GAMMA) * (-jnp.log(psel + 1e-8))
        from tamtr_tpu.ops.boxes import bbox_iou

        cb = jnp.abs(pb[:, :, None, :] - gt_b[:, None, :, :]).sum(-1)
        cg = 1.0 - bbox_iou(pb[:, :, None, :], gt_b[:, None, :, :],
                            xywh=True, RIOU=True).squeeze(-1)
        C = np.asarray(jnp.nan_to_num(
            mm.COST_CLASS * (pos - neg) + mm.COST_BBOX * cb + mm.COST_GIOU * cg,
            nan=0.0, posinf=0.0, neginf=0.0))
        for b in range(C.shape[0]):
            vi = valid[b]
            if not vi.any():
                continue
            ca = sum(C[b, m_auc[b, j], j] for j in np.nonzero(vi)[0] if m_auc[b, j] >= 0)
            cs = sum(C[b, m_sci[b, j], j] for j in np.nonzero(vi)[0] if m_sci[b, j] >= 0)
            gap = (ca - cs) / max(abs(cs), 1e-6)
            worst_gap = max(worst_gap, float(gap))

    rate = agree_pairs / max(total_pairs, 1)
    print(f"soak: {N_STEPS} steps, pair agreement {rate:.4%}, "
          f"worst relative cost gap {worst_gap:.5f}")
    assert rate >= 0.99, f"auction/scipy pair agreement {rate:.4%} < 99%"
    assert worst_gap <= 0.005, f"cost gap {worst_gap} > 0.5%"
