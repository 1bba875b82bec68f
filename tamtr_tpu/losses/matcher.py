"""Hungarian matching for the DETR loss.

The cost matrix (focal class cost + L1 + RIOU, reference
`models/utils/ops.py:12-119`) is computed on device with static shapes
(ground truth padded to `max_gt` with a validity mask). Two solvers:

- `method="scipy"`: host `linear_sum_assignment` via `jax.pure_callback`
  (exact; mirrors the reference's `.cpu()` round-trip). Used on CPU and as
  the test oracle.
- `method="auction"`/"auto": fully on-device Bertsekas auction (single
  phase, zero initial prices), vectorized over the batch — dense (nq, M)
  ops per round inside a bounded `lax.while_loop`. Measured INSIDE a
  chained jit at production shapes (B=16, nq=100, M=300) this costs
  3.2 ms — the earlier "~30 ms/step" figure was per-call dispatch+fetch
  latency, not device time. A VMEM-resident Pallas variant exists
  (`method="auction_pallas"`, kernels/auction.py) but its fixed-round
  fori_loop measures 5.8 ms at the same shapes, so the early-exiting XLA
  form stays the default. This is the TPU default — the serving TPU backend has
  no host-callback channel, and staying on device also removes the
  per-step host sync that is hot-loop #5 in the reference (SURVEY.md §3).
  With nq >= #valid-gts the auction is lightly contested and converges to
  the exact optimum in a handful of rounds (validated against scipy in
  tests); in over-full images it saturates all nq queries, mirroring the
  reference's min(nq, num_gt) matching.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tamtr_tpu.ops.boxes import bbox_iou

COST_CLASS = 2.0
COST_BBOX = 5.0
COST_GIOU = 2.0
FL_ALPHA = 0.25
FL_GAMMA = 2.0


def _solve_host(cost: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """Per-image LSA on the valid gt columns. cost: (B, nq, M); returns (B, M)
    query index matched to each gt (or -1)."""
    from scipy.optimize import linear_sum_assignment

    B, nq, M = cost.shape
    out = np.full((B, M), -1, dtype=np.int32)
    for b in range(B):
        n = int(n_valid[b])
        if n == 0:
            continue
        c = np.nan_to_num(cost[b, :, :n], nan=0.0, posinf=0.0, neginf=0.0)
        rows, cols = linear_sum_assignment(c)
        out[b, cols] = rows.astype(np.int32)
    return out


@partial(jax.jit, static_argnames=("max_rounds",))
def auction_match(
    cost: jnp.ndarray,
    gt_mask: jnp.ndarray,
    max_rounds: int = 300,
    row_mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """On-device rectangular assignment via Jacobi (all-at-once) auction.

    Feasibility requires #bidders (valid columns) <= #objects (valid rows);
    `hungarian_match` transposes over-full images so this always holds.

    Args:
      cost: (B, nq, M) assignment cost (query x gt), minimized.
      gt_mask: (B, M) validity of gt columns (the bidders).
      max_rounds: hard iteration cap for the while_loop.
      row_mask: optional (B, nq) validity of rows (the objects bid FOR) —
        used by the transposed over-full solve where padded gts are rows.
    Returns:
      (B, M) int32 query index assigned to each valid gt (-1 if none).
    """
    B, nq, M = cost.shape
    value = -cost.astype(jnp.float32)  # persons = gts maximize value
    neg = jnp.float32(-1e9)
    value = jnp.where(gt_mask[:, None, :], value, neg)
    if row_mask is not None:
        value = jnp.where(row_mask[:, :, None], value, neg)
        pair_ok = gt_mask[:, None, :] & row_mask[:, :, None]
        avail = row_mask.sum(axis=1).astype(jnp.int32)  # (B,)
    else:
        pair_ok = jnp.broadcast_to(gt_mask[:, None, :], value.shape)
        avail = jnp.full((B,), nq, jnp.int32)

    masked = jnp.where(pair_ok, value, 0.0)
    spread = jnp.maximum(
        masked.max(axis=(1, 2)) - masked.min(axis=(1, 2)), 1.0
    )  # (B,)
    # Single phase from zero prices. Price carry-over between eps-scaling
    # phases is unsound for rectangular problems (stale prices on unassigned
    # queries break the eps-CS duality bound), and with nq >> #valid-gts the
    # auction is lightly contested and converges in a few rounds even with a
    # small eps, so scaling buys nothing. CONTESTED images (#valid close to
    # nq — crowded VisDrone frames) need ~spread/eps rounds to fully assign;
    # there a coarser eps keeps convergence inside max_rounds at a bounded
    # n*eps optimality loss (~2% of a typical optimum at eps=1e-2*spread).
    n_valid = gt_mask.sum(axis=1).astype(jnp.float32)  # (B,)
    contested = n_valid >= 0.7 * avail.astype(jnp.float32)
    eps_vec = spread * jnp.where(contested, 1e-2, 1e-3)  # (B,)
    # an image is done once min(#bidders, #objects) columns are assigned —
    # over-full images (more bidders than objects) saturate and would
    # otherwise churn owners until max_rounds without this cap
    target = jnp.minimum(n_valid.astype(jnp.int32), avail)  # (B,)

    def one_phase(state, eps):
        price, owner_q, assigned = state

        def cond(s):
            i, price, owner_q, assigned = s
            done = (assigned >= 0).sum(axis=1) >= target
            return (i < max_rounds) & ~done.all()

        def body(s):
            i, price, owner_q, assigned = s
            b_ar = jnp.arange(B)[:, None]
            net = value - price[:, :, None]  # (B, nq, M)
            # top-2 over queries for each person
            w1 = jnp.max(net, axis=1)  # (B, M)
            j1 = jnp.argmax(net, axis=1)  # (B, M)
            net2 = net.at[b_ar, j1, jnp.arange(M)[None]].set(neg)
            w2 = jnp.max(net2, axis=1)  # (B, M)
            bid = jnp.take_along_axis(price, j1, axis=1) + (w1 - w2) + eps[:, None]  # (B, M)
            bidding = gt_mask & (assigned < 0) & (w1 > neg / 2)
            # dense bid matrix: person i bids only query j1[i]
            bids = jnp.where(
                (j1[:, None, :] == jnp.arange(nq)[None, :, None]) & bidding[:, None, :],
                bid[:, None, :],
                neg,
            )  # (B, nq, M)
            best_bid = jnp.max(bids, axis=2)  # (B, nq)
            best_person = jnp.argmax(bids, axis=2)  # (B, nq)
            has_bid = best_bid > neg / 2
            # previous owners of re-auctioned queries become unassigned
            kick_person = jnp.where(has_bid & (owner_q >= 0), owner_q, M)  # M => dropped
            assigned = assigned.at[b_ar, kick_person].set(-1, mode="drop")
            # award queries to the winning bidders (one query per person => no conflicts)
            win_person = jnp.where(has_bid, best_person, M)
            assigned = assigned.at[b_ar, win_person].set(
                jnp.broadcast_to(jnp.arange(nq)[None], (B, nq)), mode="drop"
            )
            owner_q = jnp.where(has_bid, best_person, owner_q)
            price = jnp.where(has_bid, best_bid, price)
            return i + 1, price, owner_q, assigned

        _, price, owner_q, assigned = jax.lax.while_loop(
            cond, body, (jnp.int32(0), price, owner_q, assigned)
        )
        return (price, owner_q, assigned), None

    price0 = jnp.zeros((B, nq), jnp.float32)
    owner0 = jnp.full((B, nq), -1, jnp.int32)
    assigned0 = jnp.full((B, M), -1, jnp.int32)
    (price, owner_q, assigned), _ = one_phase((price0, owner0, assigned0), eps_vec)
    return jnp.where(gt_mask, assigned, -1)


@jax.jit
def auction_assignment(C: jnp.ndarray, gt_mask: jnp.ndarray) -> jnp.ndarray:
    """Production assignment on a precomputed cost matrix.

    Runs the forward auction (gts bid for queries), and for OVER-FULL
    images (#valid gts > nq) the transposed auction instead: the forward
    problem has no feasible full assignment there — bidders churn to the
    round cap and the surviving subset can be far from optimal (measured
    1.5-2.3x scipy's cost). Transposed, queries bid for gts (nq bidders,
    n_valid > nq objects — feasible), which terminates eps-optimally. The
    reference hits the same regime via scipy's rectangular LSA
    (`models/utils/ops.py:114-119`).
    """
    B, nq, M = C.shape
    fwd = auction_match(C, gt_mask)
    n_valid_i = gt_mask.sum(axis=1)
    overfull = n_valid_i > nq  # (B,)

    def transposed(_):
        Ct = jnp.swapaxes(C, 1, 2)  # (B, M, nq): rows=gts, cols=queries
        qmask = jnp.ones((B, nq), bool)
        per_query_gt = auction_match(Ct, qmask, row_mask=gt_mask)  # (B, nq)
        out = jnp.full((B, M), -1, jnp.int32)
        b_ar = jnp.arange(B)[:, None]
        tgt = jnp.where(per_query_gt >= 0, per_query_gt, M)
        return out.at[b_ar, tgt].set(
            jnp.broadcast_to(jnp.arange(nq, dtype=jnp.int32)[None], (B, nq)),
            mode="drop",
        )

    rev = jax.lax.cond(
        overfull.any(), transposed,
        lambda _: jnp.full((B, M), -1, jnp.int32), None,
    )
    return jnp.where(overfull[:, None], rev, fwd)


def hungarian_match(
    pred_bboxes: jnp.ndarray,
    pred_scores: jnp.ndarray,
    gt_bboxes: jnp.ndarray,
    gt_cls: jnp.ndarray,
    gt_mask: jnp.ndarray,
    method: str = "auto",
) -> jnp.ndarray:
    """Optimal assignment between predictions and padded ground truth.

    Args:
      pred_bboxes: (B, nq, 4) cxcywh in [0, 1].
      pred_scores: (B, nq, nc) logits.
      gt_bboxes: (B, M, 4) cxcywh.
      gt_cls: (B, M) int32.
      gt_mask: (B, M) bool validity (valid entries must be contiguous from 0).
      method: "scipy" (exact, host callback; test oracle only — callbacks
        are unavailable on the serving TPU runtime and force pathological
        maximal-device partitioning under SPMD) or "auction"/"auto"
        (on-device, the production path everywhere).
    Returns:
      (B, M) int32: matched query index per gt, -1 for unmatched/padding.
    """
    pred_bboxes = jax.lax.stop_gradient(pred_bboxes)
    pred_scores = jax.lax.stop_gradient(pred_scores)
    B, nq, nc = pred_scores.shape
    M = gt_bboxes.shape[1]

    p = jax.nn.sigmoid(pred_scores)  # focal-style (use_fl=True)
    ps = jnp.take_along_axis(p, gt_cls[:, None, :], axis=2)  # (B, nq, M)
    neg = (1 - FL_ALPHA) * (ps**FL_GAMMA) * (-jnp.log(1 - ps + 1e-8))
    pos = FL_ALPHA * ((1 - ps) ** FL_GAMMA) * (-jnp.log(ps + 1e-8))
    cost_class = pos - neg

    cost_bbox = jnp.abs(pred_bboxes[:, :, None, :] - gt_bboxes[:, None, :, :]).sum(-1)
    riou = bbox_iou(pred_bboxes[:, :, None, :], gt_bboxes[:, None, :, :], xywh=True, RIOU=True)
    cost_giou = 1.0 - riou.squeeze(-1)

    C = COST_CLASS * cost_class + COST_BBOX * cost_bbox + COST_GIOU * cost_giou
    C = jnp.nan_to_num(C, nan=0.0, posinf=0.0, neginf=0.0)

    if method in ("auto", "auction"):
        return auction_assignment(C, gt_mask)
    if method == "auction_pallas":
        # VMEM-resident Pallas variant: same math, same tie-breaking as the
        # XLA auction (exactness asserted in tests/test_auction_kernel.py),
        # but its fixed-round fori_loop loses to the early-exiting
        # while_loop at production shapes (5.8 vs 3.2 ms) — opt-in only.
        from tamtr_tpu.kernels.auction import auction_match_pallas

        return auction_match_pallas(C, gt_mask)

    n_valid = gt_mask.sum(axis=1).astype(jnp.int32)
    result = jax.pure_callback(
        _solve_host,
        jax.ShapeDtypeStruct((B, M), jnp.int32),
        C.astype(jnp.float32),
        n_valid,
        vmap_method="sequential",
    )
    return jnp.where(gt_mask, result, -1)
