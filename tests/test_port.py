"""Torch-weight porter tests against the ACTUAL reference module tree.

Constructs the reference `RTDETRDetectionWorldModel` (CPU, import shims from
tools/refstubs.py), ports its state_dict with tools/port_torch_weights.py,
and checks (a) 100% bidirectional name+shape coverage and (b) numeric
forward parity of the ported backbone+neck (graph layers 0-40; the head's
selective-scan has no CPU path in the reference, SURVEY A.10).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference tree unavailable")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="module")
def ref_model():
    torch = pytest.importorskip("torch")
    from tools.refstubs import install_reference_stubs

    # Hermeticity: (a) torch CPU intra-op threading makes float reductions
    # non-associative run-to-run, which flips near-tie top-k selections in
    # the reference head (`head.py:1221-1266`) depending on what ran before
    # this module — one thread = deterministic reduction order; (b) the
    # reference model's random init draws from torch's GLOBAL rng, so any
    # earlier test that consumed it changed these weights (and how many
    # near-ties sit at the top-k boundary) — seed it so the constructed
    # model is identical no matter what ran before.
    torch.set_num_threads(1)
    torch.manual_seed(0)
    install_reference_stubs(str(REF))
    from ultralytics.nn.tasks import RTDETRDetectionWorldModel

    m = RTDETRDetectionWorldModel(
        str(REF / "ultralytics/cfg/models/TAMTR/TAMTR.yaml"), nc=10, verbose=False
    )
    m.eval()
    return m


@pytest.fixture(scope="module")
def ported(ref_model):
    from tamtr_tpu.nn.graph import TAMTRModel
    from tools.port_torch_weights import port_state_dict

    sd = {k: v.float().numpy() for k, v in ref_model.state_dict().items()}
    model = TAMTRModel.from_yaml("tamtr.yaml", nc=10)
    params, batch_stats, report = port_state_dict(sd, model)
    return model, params, batch_stats, report


def test_full_name_and_shape_coverage(ported):
    _, _, _, report = ported
    for key, items in report.items():
        assert not items, f"{key}: {len(items)} problems; first: {items[:5]}"


def test_backbone_neck_forward_parity(ref_model, ported):
    """Ported weights reproduce the reference backbone+neck on a fixed image."""
    import torch

    model, params, batch_stats, _ = ported
    rng = np.random.default_rng(0)
    img = rng.random((1, 64, 64, 3), dtype=np.float32)
    txt = rng.standard_normal((1, 10, 512)).astype(np.float32)

    # reference forward through layers 0..40 (replicates the predict loop,
    # reference tasks.py:643-670)
    ref_feats = {}
    with torch.no_grad():
        x = torch.from_numpy(img.transpose(0, 3, 1, 2)).contiguous()
        t = torch.from_numpy(txt)
        y = []
        for m in ref_model.model[:-1]:
            if m.f != -1:
                x = y[m.f] if isinstance(m.f, int) else [
                    x if j == -1 else y[j] for j in m.f
                ]
            if type(m).__name__ == "TIAGELAN":
                x = m(x, t)
            else:
                x = m(x)
            y.append(x if m.i in ref_model.save else None)
        head_from = ref_model.model[-1].f
        for j in head_from:
            ref_feats[j] = y[j].numpy()

    import jax.numpy as jnp

    feats = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(img), jnp.asarray(txt), None, False, features_only=True,
    )
    for lvl, j in enumerate(sorted(ref_feats)):
        ours = np.asarray(feats[lvl]).transpose(0, 3, 1, 2)  # NHWC -> NCHW
        ref = ref_feats[j]
        assert ours.shape == ref.shape, (lvl, ours.shape, ref.shape)
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)


def test_full_model_eval_parity(ref_model, ported):
    """Head-inclusive end-to-end eval parity with ported weights.

    Patches the reference's CUDA selective-scan bindings with a naive torch
    recurrence (tools/refstubs.install_scan_oracle) so the ENTIRE reference
    forward — VSS levels, deformable decoder, contrastive heads — runs on
    CPU (reference `nn/tasks.py:625-672` -> `head.py:1005-1293`), then
    asserts the eval outputs (normalized cxcywh boxes + sigmoid scores,
    reference `head.py:1166-1175`) match the TPU model with ported weights.
    """
    import torch

    from tools.refstubs import install_scan_oracle

    install_scan_oracle()

    model, params, batch_stats, _ = ported
    rng = np.random.default_rng(7)
    # 64px: token count 16^2 + 8^2 + 4^2 = 336 >= nq=100, so top-k query
    # selection is exercised without the tiny-input tiling fallback.
    img = rng.random((1, 64, 64, 3), dtype=np.float32)
    txt = rng.standard_normal((1, 10, 512)).astype(np.float32)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)

    with torch.no_grad():
        ref_out = ref_model.predict(
            torch.from_numpy(img.transpose(0, 3, 1, 2)).contiguous(),
            txt_feats=torch.from_numpy(txt),
        )
    ref_pred = ref_out[0].numpy()  # (B, nq, 4 + nc)

    import jax.numpy as jnp

    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(img), jnp.asarray(txt), None, False,
    )
    pred = np.asarray(out["pred"])
    assert pred.shape == ref_pred.shape, (pred.shape, ref_pred.shape)
    # Tie-robust SET comparison: the head selects its nq queries by top-k
    # over encoder scores (`head.py:1221-1266`); random-init weights leave
    # near-ties at the selection boundary, and a ~1e-7 float difference can
    # swap which of two tied queries is picked (or their order). Row-by-row
    # comparison is therefore flaky by construction. Instead match rows
    # 1-1 optimally (boxes and scores both live in [0, 1], so one max-abs
    # metric over the whole row works) and require the sets to agree.
    from scipy.optimize import linear_sum_assignment

    dist = np.abs(pred[0][:, None, :] - ref_pred[0][None, :, :]).max(-1)
    rows, cols = linear_sum_assignment(dist)
    matched = dist[rows, cols] < 1e-3
    assert matched.sum() >= 98, (
        f"only {matched.sum()}/{len(matched)} rows matched; "
        f"worst {np.sort(dist[rows, cols])[-3:]}"
    )
    # The (<=2) unmatched rows must be boundary ties, not real divergence:
    # their best class scores must agree as multisets.
    if not matched.all():
        s_my = np.sort(pred[0][rows[~matched], 4:].max(-1))
        s_ref = np.sort(ref_pred[0][cols[~matched], 4:].max(-1))
        np.testing.assert_allclose(s_my, s_ref, atol=5e-3)


def test_train_mode_loss_parity_no_dn(ref_model, ported):
    """Train-mode forward + FULL loss stack parity with ported weights,
    denoising off (CDN uses framework-specific randomness; everything else —
    train-mode BN batch stats, per-layer box chaining
    `transformer.py:884-893`, matcher, VFL/L1/RIOU losses with per-layer aux
    — must agree). Exercises my auction matcher against the reference's
    scipy Hungarian end to end (`models/utils/ops.py:114-119`)."""
    import torch

    from tools.refstubs import install_scan_oracle

    install_scan_oracle()

    _, params, batch_stats, _ = ported
    from tamtr_tpu.nn.graph import TAMTRModel

    # fresh model config: dn off, DropPath off (the reference import stub
    # makes DropPath identity; vss_drop_path=0 matches that in train mode)
    model = TAMTRModel.from_yaml("tamtr.yaml", nc=10, num_denoising=0,
                                 vss_drop_path=0.0, max_gt=8)

    rng = np.random.default_rng(11)
    img = rng.random((1, 64, 64, 3), dtype=np.float32)
    txt = rng.standard_normal((1, 10, 512)).astype(np.float32)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    n_gt = 5
    gt_cls = rng.integers(0, 10, (n_gt,)).astype(np.int64)
    gt_box = np.stack(
        [rng.uniform(0.3, 0.7, n_gt), rng.uniform(0.3, 0.7, n_gt),
         rng.uniform(0.1, 0.25, n_gt), rng.uniform(0.1, 0.25, n_gt)], 1
    ).astype(np.float32)

    head = ref_model.model[-1]
    old_nd = head.num_denoising
    head.num_denoising = 0
    # init_criterion reads self.nc, which only the reference TRAINER sets
    # (`rtdetrworld/train.py`); set it like the trainer would
    ref_model.nc = 10
    # Train-mode forward mutates BN running stats; snapshot so the later
    # export tests (which re-read state_dict as the bitwise template) see
    # the same tensors the `ported` fixture was built from.
    snapshot = {k: v.clone() for k, v in ref_model.state_dict().items()}
    ref_model.train()
    try:
        batch = {
            "img": torch.from_numpy(img.transpose(0, 3, 1, 2)).contiguous(),
            "cls": torch.from_numpy(gt_cls).view(-1, 1),
            "bboxes": torch.from_numpy(gt_box),
            "batch_idx": torch.zeros(n_gt, dtype=torch.long),
            "txt_feats": torch.from_numpy(txt),
        }
        with torch.no_grad():
            total, items = ref_model.loss(batch)
            preds = ref_model.predict(
                batch["img"], batch=None, txt_feats=batch["txt_feats"]
            )
        ref_dec_b, ref_dec_s, ref_enc_b, ref_enc_s, dn_meta = preds
        assert dn_meta is None
    finally:
        head.num_denoising = old_nd
        ref_model.eval()
        ref_model.load_state_dict(snapshot, strict=True)

    import jax
    import jax.numpy as jnp

    from tamtr_tpu.losses.detr_loss import DETRLossConfig, rtdetr_detection_loss

    M = 8
    targets = {
        "cls": jnp.asarray(np.pad(gt_cls, (0, M - n_gt)).astype(np.int32))[None],
        "bboxes": jnp.asarray(np.pad(gt_box, ((0, M - n_gt), (0, 0))))[None],
        "mask": jnp.asarray(np.arange(M) < n_gt)[None],
    }
    outputs, _ = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(img), jnp.asarray(txt), targets, True,
        rngs={"cdn": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    # train-mode forward parity first (isolates forward bugs from loss bugs).
    # Train-mode BN batch stats make the random-init encoder logits nearly
    # degenerate (ties at ~1e-5), so top-k may pick a slightly different
    # boundary SET of queries across frameworks (measured: 97/100 identical
    # to 1e-7). Compare under the optimal box-matching permutation and
    # require >= 95 matched queries per layer; the loss comparison below is
    # the exact end-to-end check (it is permutation-invariant and the
    # boundary queries are background everywhere).
    from scipy.optimize import linear_sum_assignment

    my_b = np.asarray(outputs["dec_bboxes"])  # (ndl, 1, nq, 4)
    my_s = np.asarray(outputs["dec_scores"])
    rf_b = ref_dec_b.numpy()
    rf_s = ref_dec_s.numpy()
    dist = np.abs(my_b[-1, 0, :, None, :] - rf_b[-1, 0, None, :, :]).max(-1)
    rows, perm = linear_sum_assignment(dist)
    matched = dist[rows, perm] < 2e-3
    assert matched.sum() >= 95, f"only {matched.sum()}/100 queries matched"
    for layer in range(my_b.shape[0]):
        db = np.abs(my_b[layer, 0] - rf_b[layer, 0, perm]).max(-1)
        ds = np.abs(my_s[layer, 0] - rf_s[layer, 0, perm]).max(-1)
        assert db[matched].max() < 2e-3, f"layer {layer} box {db[matched].max()}"
        assert ds[matched].max() < 5e-2, f"layer {layer} score {ds[matched].max()}"
    my_eb = np.asarray(outputs["enc_bboxes"])[0]
    rf_eb = ref_enc_b.numpy()[0]
    d_enc = np.abs(my_eb[:, None, :] - rf_eb[None, :, :]).max(-1)
    r2, c2 = linear_sum_assignment(d_enc)
    assert (d_enc[r2, c2] < 2e-3).sum() >= 95

    loss, comps = rtdetr_detection_loss(outputs, targets, DETRLossConfig(nc=10))
    # reference returns (sum, [giou, class, bbox] detached)
    ref_items = items.numpy()
    ours = np.array([float(comps["giou"]), float(comps["class"]), float(comps["bbox"])])
    np.testing.assert_allclose(ours, ref_items, rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(float(loss), float(total), rtol=2e-2)


def test_export_round_trips_bitwise(ref_model, ported):
    """flax -> torch export exactly inverts the port (every tensor equal)."""
    from tools.port_torch_weights import export_state_dict

    model, params, batch_stats, _ = ported
    template = {k: v.float().numpy() for k, v in ref_model.state_dict().items()}
    sd, report = export_state_dict(params, batch_stats, model, template)
    for key, items in report.items():
        assert not items, f"{key}: {len(items)} problems; first: {items[:5]}"
    assert sd.keys() == template.keys()
    for k, v in template.items():
        np.testing.assert_array_equal(sd[k], v, err_msg=k)


def test_exported_state_dict_loads_strict(ref_model, ported):
    """The reference model accepts the exported dict with strict=True."""
    import torch

    from tools.port_torch_weights import export_state_dict

    model, params, batch_stats, _ = ported
    template = {k: v.float().numpy() for k, v in ref_model.state_dict().items()}
    sd, _ = export_state_dict(params, batch_stats, model, template)
    ref_model.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()}, strict=True)


def test_linear_and_embedding_orientation(ported):
    """Spot-check transpose rules: linear kernels transposed, embedding not."""
    model, params, _, _ = ported
    # denoising class embed: (nc + 1, hd) row-major table
    assert params["head"]["denoising_class_embed"].shape == (11, 512)
    # enc_score_head: torch (10, 512) -> flax kernel (512, 10)
    assert params["head"]["enc_score_head"]["kernel"].shape == (512, 10)
    # qkv split from in_proj: three (512, 512) kernels
    sa = params["head"]["layer0"]["self_attn"]
    for k in ("q_proj", "k_proj", "v_proj"):
        assert sa[k]["kernel"].shape == (512, 512)
        assert sa[k]["bias"].shape == (512,)
