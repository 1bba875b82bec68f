"""Training state, optimizer schedule, EMA, and the jit/pjit train step.

Optimizer semantics replicate the reference recipe
(`engine/trainer.py:624-681, 268-341`, `cfg/default.yaml`):

- AdamW lr0=1e-4, betas=(momentum, 0.999) with momentum=0.937, weight decay
  1e-4 scaled by bs * accumulate / nbs (nbs=64), applied only to
  non-bias/non-norm weights (the reference's three param groups).
- Linear warmup over `warmup_iters` *iterations* (the reference reads
  `warmup_epochs: 2000` as an iteration count, `trainer.py:296`): weights/norm
  groups ramp 0 -> lr, bias group ramps warmup_bias_lr=0.1 -> lr.
- Main schedule `lf(e) = (1 - e/epochs) * (1 - lrf) + lrf`; TAM-TR ships
  lrf=1.0 => constant LR after warmup.
- Gradient clipping at global-norm 10.0 (`trainer.py:471-479`).
- EMA with decay 0.9999 * (1 - exp(-t / 2000)) over params AND batch stats
  (`utils/torch_utils.py:392-425`); validation/checkpoints use the EMA.

The reference's `loss *= world_size` DDP hack + per-rank sum collapses to a
plain global-batch sum under pjit: the loss is summed over the (sharded)
batch axis, so gradients equal the single-process reference exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from tamtr_tpu.losses.detr_loss import DETRLossConfig, rtdetr_detection_loss


@dataclass(frozen=True)
class TrainConfig:
    lr0: float = 1e-4
    lrf: float = 1.0
    momentum: float = 0.937  # Adam beta1
    weight_decay: float = 1e-4
    warmup_iters: int = 2000
    warmup_bias_lr: float = 0.1
    # warmup momentum ramp 0.8 -> momentum (`trainer.py:338-341`). The
    # reference applies it only to param groups with a "momentum" key, i.e.
    # SGD — AdamW groups carry "betas" and are NOT ramped, so the TAM-TR
    # recipe default is False. Set True to ramp Adam beta1 the same way.
    warmup_momentum: float = 0.8
    momentum_warmup: bool = False
    epochs: int = 300
    batch_size: int = 6
    nbs: int = 64  # nominal batch size for gradient accumulation + wd scaling
    accumulate: int = 0  # 0 => round(nbs / batch_size)
    grad_clip: float = 10.0
    ema_decay: float = 0.9999
    ema_tau: float = 2000.0
    match_method: str = "auto"
    # skip the optimizer/EMA update when loss or grads are non-finite
    # (the reference has no guard and relies on AMP checks, SURVEY §5.2)
    skip_nonfinite: bool = True

    @property
    def accum_steps(self) -> int:
        return self.accumulate or max(round(self.nbs / self.batch_size), 1)

    @property
    def scaled_wd(self) -> float:
        return self.weight_decay * self.batch_size * self.accum_steps / self.nbs


class TrainState(struct.PyTreeNode):
    """Train state with FLAT parameter storage.

    `params` / `ema_params` are single (P,) fp32 vectors; `unravel` (static
    aux data, not a pytree leaf) restores the model's structured tree. Flat
    storage is a TPU-runtime necessity here: per-leaf optimizer/EMA updates
    over this model's ~3.5k parameter leaves compiled to tens of thousands
    of small device ops whose fixed per-op overhead alone cost ~15 s/step;
    the flat form runs the same math in ~15 fused ops (measured 36x).
    """

    step: jnp.ndarray
    params: jnp.ndarray  # (P,) flat
    batch_stats: Any  # structured (few hundred small leaves)
    opt_state: Any
    ema_params: jnp.ndarray  # (P,) flat
    ema_batch_stats: Any
    unravel: Any = struct.field(pytree_node=False, default=None)

    def params_tree(self):
        return self.unravel(self.params) if self.unravel else self.params

    def ema_params_tree(self):
        return self.unravel(self.ema_params) if self.unravel else self.ema_params


# flat vectors are zero-padded to a multiple of this so the ZeRO data-axis
# sharding (any power-of-2 device count up to 2048) splits them evenly;
# `unravel` ignores the tail, and the optimizer math is exact on zeros
# (masks are False / grads are 0 in the pad region) — semantically inert
PAD_MULTIPLE = 2048


def padded_size(n: int, multiple: int = PAD_MULTIPLE) -> int:
    return n + (-n) % multiple


def _pad_flat(flat: jnp.ndarray, multiple: int = PAD_MULTIPLE) -> jnp.ndarray:
    pad = (-flat.shape[0]) % multiple
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    return flat


def flatten_tree(tree) -> jnp.ndarray:
    """Concat all leaves (tree_flatten order, row-major ravel) into (P,) f32,
    zero-padded to PAD_MULTIPLE (see above)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return _pad_flat(jnp.concatenate([jnp.ravel(l).astype(jnp.float32) for l in leaves]))


def unravel_for(shapes_tree) -> Callable:
    """Build the inverse of `flatten_tree` from a tree of shaped leaves
    (arrays or ShapeDtypeStructs). Works without concrete values, unlike
    `jax.flatten_util.ravel_pytree`."""
    leaves, treedef = jax.tree_util.tree_flatten(shapes_tree)
    shapes = [tuple(l.shape) for l in leaves]
    dtypes = [l.dtype for l in leaves]
    sizes = [int(np.prod(sh)) for sh in shapes]
    offsets = np.cumsum([0] + sizes)

    def unravel(flat):
        return jax.tree_util.tree_unflatten(
            treedef,
            [
                jax.lax.slice_in_dim(flat, int(offsets[i]), int(offsets[i + 1]))
                .reshape(shapes[i])
                .astype(dtypes[i])
                for i in range(len(shapes))
            ],
        )

    return unravel


def unravel_for_model(model, nc: int, max_gt: Optional[int] = None) -> Callable:
    """Reconstruct the params unravel for a model without weights in hand
    (e.g. when loading a flat checkpoint): abstract-init on tiny shapes
    (parameter shapes are input-size independent) in TRAIN mode so the
    denoising-branch params exist. `max_gt` must match the model's CDN
    layout; defaults to the model's own max_gt."""
    max_gt = max_gt or getattr(model, "max_gt", 8)
    k = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    txt = jnp.zeros((1, max(nc, 1), 512), jnp.float32)
    targets = {
        "cls": jnp.zeros((1, max_gt), jnp.int32),
        "bboxes": jnp.full((1, max_gt, 4), 0.5, jnp.float32),
        "mask": jnp.zeros((1, max_gt), bool),
    }
    shapes = jax.eval_shape(
        lambda: model.init({"params": k, "cdn": k, "dropout": k}, img, txt, targets, True)
    )
    return unravel_for(shapes["params"])


def _bf16_consumed(path: str) -> bool:
    """True for param leaves the model's flax modules cast to bf16 themselves
    (dtype=x.dtype sites). Pre-casting exactly these right after the unravel
    is semantically a NO-OP (the module cast becomes the identity) but lets
    XLA fuse each convert into the leaf's slice-of-flat-vector instead of
    hoisting ONE whole-vector f32->bf16 retile — which the r5 trace measured
    at 8.0 ms (pathological [42M]->[10.5M,4] reshape) + 3.6 ms relayout per
    step (bench_artifacts/r05/NOTES.md). f32-consumed params (BN/LN, scan
    A/D/dt, box MLPs, score heads, sampling offsets, AIFI) are NOT listed:
    casting those would change semantics. Exactness is enforced by
    tests/test_train.py::test_precast_bf16_is_identity (bitwise-equal loss
    against the cast disabled)."""
    if "AIFI" in path:  # AIFI's attention/FFN run fp32 (no dtype param)
        return False
    if "BatchNorm" in path or "_bn/" in path:
        # BatchNorm scale/bias are fp32-consumed in training even when the
        # parent module is named *_conv (cv2_conv, proj_conv, ...) — the
        # first predicate version cast them and shifted the loss at 1e-5
        return False
    # NOT listed (f32-consumed, verified against the identity test): the
    # decoder query stream — enc_output_dense has no dtype, so embeddings
    # and everything touching them (self_attn q/k/v/out, linear1/2, norms,
    # score/bbox heads) run f32 even in bf16 models.
    return (
        "Conv_0/kernel" in path      # ConvBN / DWConvBN conv kernels
        or "/op/conv2d/" in path     # SS2D depthwise conv (+bias)
        or "/op/in_proj/" in path    # SS2D input projection
        or "/op/out_proj/" in path   # SS2D output projection (input is
        #                              LN(dtype=bf16) * silu gate -> bf16)
        or "/op/x_proj_weight" in path  # SS2D (explicit astype(cd))
        or "/conv/" in path          # CBLinear conv (dtype=x.dtype)
        or "/value_proj/" in path    # MSDeformAttn (value = flat, bf16)
        or "/output_proj/" in path   # MSDeformAttn (gather out in value dtype)
        or "/mlp/fc" in path         # VSSBlock Mlp fc1/fc2 (dtype=x.dtype)
        or "_conv/kernel" in path    # decoder input_proj{i}_conv
    )


def precast_bf16_params(tree):
    """Cast the bf16-consumed subset of a params tree (see _bf16_consumed)."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(tree)
    out = {
        k: (v.astype(jnp.bfloat16)
            if _bf16_consumed("/" + "/".join(map(str, k))) else v)
        for k, v in flat.items()
    }
    return unflatten_dict(out)


def _is_no_decay(path: Tuple, leaf) -> bool:
    """bias / norm-scale leaves get no weight decay (reference param groups)."""
    keys = [getattr(p, "key", str(p)) for p in path]
    name = keys[-1] if keys else ""
    if name in ("bias",):
        return True
    # LayerNorm/BatchNorm scales: flax names them 'scale'
    if name == "scale":
        return True
    # ssm special params: dt bias etc. treat 1-D params as no-decay
    if leaf.ndim <= 1:
        return True
    return False


def _decay_mask(params) -> Any:
    return jax.tree_util.tree_map_with_path(lambda p, x: not _is_no_decay(p, x), params)


def _bias_mask(params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda p, x: getattr(p[-1], "key", str(p[-1])) == "bias", params
    )


def make_lr_schedules(cfg: TrainConfig, steps_per_epoch: int):
    """Per-group lr schedules (bias group has the warmup_bias_lr ramp)."""

    def lf(epoch):
        return (1.0 - epoch / cfg.epochs) * (1.0 - cfg.lrf) + cfg.lrf

    def sched(step, warmup_from):
        step = jnp.asarray(step, jnp.float32)
        epoch = step / max(steps_per_epoch, 1)
        target = cfg.lr0 * lf(epoch)
        nw = float(max(cfg.warmup_iters, 1))
        warm = warmup_from + (target - warmup_from) * jnp.minimum(step / nw, 1.0)
        return jnp.where(step < nw, warm, target)

    return (lambda s: sched(s, 0.0)), (lambda s: sched(s, cfg.warmup_bias_lr))


class FlatOptState(NamedTuple):
    count: jnp.ndarray  # () optimizer steps taken
    ni: jnp.ndarray  # () minibatches seen (the reference's `ni` counter)
    last_opt: jnp.ndarray  # () ni at the last optimizer step (init -1)
    m: jnp.ndarray  # (P,) first moment
    v: jnp.ndarray  # (P,) second moment
    acc: jnp.ndarray  # (P,) accumulated (summed) gradients since last step
    # per-element group masks live in the state (device arrays) rather than
    # as closure constants: 30M-element constants baked into the HLO blow
    # past the remote-compile request size limit
    decay_mask: jnp.ndarray  # (P,) bool
    bias_mask: jnp.ndarray  # (P,) bool


def make_optimizer(cfg: TrainConfig, params, steps_per_epoch: int) -> optax.GradientTransformation:
    """AdamW with reference param groups + gradient accumulation, computed on
    ONE flattened vector.

    Semantics match the reference optimizer loop
    (`engine/trainer.py:330-347,471-479`):

    - gradients are SUMMED across minibatches (torch `.backward()` without
      `zero_grad`), and the optimizer steps only when
      `ni - last_opt_step >= accumulate`;
    - during warmup, `accumulate` interpolates 1 -> nbs/bs over
      `warmup_iters` minibatches (then stays at max(round(nbs/bs), 1));
    - clipping (global-norm 10.0) is applied to the accumulated gradient at
      step time, like the reference's `optimizer_step`;
    - lr schedules are indexed by the MINIBATCH counter `ni` (the reference
      warmup interpolates per iteration, not per optimizer step);
    - optional beta1 warmup 0.8 -> momentum (`momentum_warmup`, see
      TrainConfig — the reference only ramps SGD momentum).

    The math runs on a single (P,) vector with precomputed per-element
    decay/bias masks: a per-leaf optax chain compiled to ~40 tiny device ops
    per leaf; at this model's ~3.5k leaves and the runtime's ~20 us/op
    dispatch floor that was ~15 s per step — the flat form is ~20 large
    fused ops regardless of leaf count. The no-step path is encoded
    arithmetically (b1_eff=1, lr_eff=0, ...) instead of `where(step, new,
    old)` over whole buffers so XLA keeps buffer donation.
    """
    from jax.flatten_util import ravel_pytree

    lr_main, lr_bias = make_lr_schedules(cfg, steps_per_epoch)
    b1, b2, eps = cfg.momentum, 0.999, 1e-8
    wd = cfg.scaled_wd
    clip = cfg.grad_clip
    nw = float(max(cfg.warmup_iters, 1))
    # ramp target is the UNROUNDED nbs/bs (reference interpolates to
    # nbs/batch_size and rounds the interpolated value, `trainer.py:333`)
    accum_target = float(cfg.accumulate) if cfg.accumulate > 0 else cfg.nbs / cfg.batch_size
    fixed_accum = cfg.accumulate > 0  # explicit accumulate: no warmup ramp
    wm, do_wm = cfg.warmup_momentum, cfg.momentum_warmup

    def _accumulate_at(ni):
        """Reference: max(1, round(interp(ni, [0, nw], [1, nbs/bs])))."""
        if fixed_accum:
            return jnp.full((), accum_target, jnp.float32)
        frac = jnp.clip(ni.astype(jnp.float32) / nw, 0.0, 1.0)
        return jnp.maximum(jnp.round(1.0 + frac * (accum_target - 1.0)), 1.0)

    def _beta1_at(ni):
        if not do_wm:
            return jnp.full((), b1, jnp.float32)
        frac = jnp.clip(ni.astype(jnp.float32) / nw, 0.0, 1.0)
        return wm + frac * (b1 - wm)

    def init(params_tree):
        """Masks need the STRUCTURED tree (names/shapes); pass the model's
        params tree here even when training on the flat vector."""
        flat, _ = ravel_pytree(params_tree)
        flat = _pad_flat(flat)
        dm_flat, _ = ravel_pytree(
            jax.tree.map(
                lambda p, m: np.full(p.shape, m, bool), params_tree,
                _decay_mask(params_tree),
            )
        )
        bm_flat, _ = ravel_pytree(
            jax.tree.map(
                lambda p, m: np.full(p.shape, m, bool), params_tree,
                _bias_mask(params_tree),
            )
        )
        dm_flat = _pad_flat(jnp.asarray(dm_flat))
        bm_flat = _pad_flat(jnp.asarray(bm_flat))
        # m, v, acc must be DISTINCT buffers: donating one buffer twice is an
        # execute-time error ("attempt to donate the same buffer twice")
        return FlatOptState(
            jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
            jnp.full((), -1, jnp.int32),
            jnp.zeros_like(flat),
            jnp.zeros_like(flat),
            jnp.zeros_like(flat),
            jnp.asarray(dm_flat),
            jnp.asarray(bm_flat),
        )

    def update(grads, state, params=None):
        """Flat-native: grads/params are (P,) vectors; returns flat updates.
        Structured trees are accepted too (flattened on entry, and the
        updates come back structured) for API compatibility."""
        structured = not hasattr(grads, "ndim") or grads.ndim != 1
        unravel = None
        if structured:
            g, unravel = ravel_pytree(grads)
        else:
            g = grads
        n_real = g.shape[0]  # caller's length (raw or already padded)
        if n_real < state.m.shape[0]:
            g = _pad_flat(g)  # raw (unpadded) flat gradient: zero-extend
        if g.shape != state.m.shape:
            raise ValueError(
                f"flat gradient length {g.shape} != optimizer state {state.m.shape}"
            )
        ni = state.ni
        acc = state.acc + g  # summed, like repeated .backward()
        do_step = (ni - state.last_opt).astype(jnp.float32) >= _accumulate_at(ni)
        s = do_step.astype(jnp.float32)

        gnorm = jnp.linalg.norm(acc)
        gc = acc * jnp.minimum(1.0, clip / jnp.maximum(gnorm, 1e-6))
        count = state.count + do_step.astype(jnp.int32)
        # no-step path: b1_eff=1 keeps m; (1-b1_eff)=0 drops the gradient
        b1_t = _beta1_at(ni)
        b1_eff = 1.0 - s * (1.0 - b1_t)
        b2_eff = 1.0 - s * (1.0 - b2)
        m = b1_eff * state.m + (1.0 - b1_eff) * gc
        v = b2_eff * state.v + (1.0 - b2_eff) * gc * gc
        cf = jnp.maximum(count.astype(jnp.float32), 1.0)
        mhat = m / (1.0 - b1_t ** cf)
        vhat = v / (1.0 - b2 ** cf)
        upd = mhat / (jnp.sqrt(vhat) + eps)
        if params is not None and wd:
            if hasattr(params, "ndim") and params.ndim == 1:
                p_flat = params
            else:
                p_flat = ravel_pytree(params)[0]
            if p_flat.shape[0] < state.m.shape[0]:
                p_flat = _pad_flat(p_flat)
            upd = upd + jnp.where(state.decay_mask, wd * p_flat, 0.0)
        lr_elem = jnp.where(state.bias_mask, lr_bias(ni), lr_main(ni))
        upd = (-s * lr_elem) * upd  # zero update on non-step minibatches
        acc = acc * (1.0 - s)  # reset after a step
        new_state = FlatOptState(
            count,
            ni + 1,
            jnp.where(do_step, ni, state.last_opt).astype(jnp.int32),
            m,
            v,
            acc,
            state.decay_mask,
            state.bias_mask,
        )
        if structured:
            upd = unravel(upd[:n_real])
        elif n_real != upd.shape[0]:
            upd = upd[:n_real]  # match the caller's raw flat length
        return upd, new_state

    return optax.GradientTransformation(init, update)


def create_train_state(
    model,
    rng: jax.Array,
    cfg: TrainConfig,
    img_shape: Tuple[int, int, int, int],
    nc: int,
    n_text: Optional[int] = None,
    steps_per_epoch: int = 1000,
    max_gt: int = 128,
    text_dim: int = 512,
) -> Tuple[TrainState, optax.GradientTransformation]:
    """Initialize model variables + optimizer (jit the init for speed).

    `text_dim` must equal the head hidden dim `hd` (the reference
    contrastive heads dot text and region embeds directly, `block.py:522-541`
    — CLIP ViT-B/32 gives 512, matching TAM-TR's hd=512)."""
    n_text = n_text or nc
    img = jnp.zeros(img_shape, jnp.float32)
    txt = jnp.zeros((img_shape[0], n_text, text_dim), jnp.float32)
    targets = {
        "cls": jnp.zeros((img_shape[0], max_gt), jnp.int32),
        "bboxes": jnp.full((img_shape[0], max_gt, 4), 0.5, jnp.float32),
        "mask": jnp.zeros((img_shape[0], max_gt), bool),
    }
    k1, k2, k3 = jax.random.split(rng, 3)

    # NOTE: rngs/inputs must be jit *arguments* — closing over them makes them
    # compile-time constants and XLA constant-folds the whole init graph on
    # the host (minutes instead of seconds).
    def _init(k1, k2, k3, img, txt, targets):
        return model.init(
            {"params": k1, "cdn": k2, "dropout": k3}, img, txt, targets, True
        )

    variables = jax.jit(_init)(k1, k2, k3, img, txt, targets)
    params_tree = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg, params_tree, steps_per_epoch)
    unravel = unravel_for(params_tree)
    p_flat = jax.jit(flatten_tree)(params_tree)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=p_flat,
        batch_stats=batch_stats,
        opt_state=tx.init(params_tree),
        # independent EMA buffers (donation would otherwise see the same
        # buffer twice)
        ema_params=jnp.copy(p_flat),
        ema_batch_stats=jax.tree.map(jnp.copy, batch_stats),
        unravel=unravel,
    )
    return state, tx


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_cfg: Any,
    cfg: TrainConfig,
    loss_callable: Optional[Callable] = None,
    mesh: Any = None,
    zero: bool = False,
) -> Callable:
    """Build the jittable train step: (state, batch, rng) -> (state, metrics).

    `batch`: img (B,H,W,3) f32 in [0,1] or uint8 (normalized on device);
    txt_feats (B,K,512);
    cls (B,M) int32; bboxes (B,M,4) normalized cxcywh; mask (B,M) bool.
    `loss_callable(outputs, targets) -> (loss, items)` defaults to the
    RT-DETR detection loss; the YOLO task passes `v8_detection_loss`.

    `mesh` + `zero=True`: ZeRO-1 over the data axis — the flat master
    params, Adam moments, accumulation buffer, and EMA live sharded n-ways
    over the SAME axis the batch shards over (place the state with
    `parallel.mesh.train_state_shardings(mesh, state, zero=True)`); the step
    all-gathers params once for compute and reduce-scatters the flat
    gradient. Per-chip optimizer-state memory drops by the device count at
    zero data-parallel throughput cost (every device still computes a
    distinct batch shard).
    """
    if loss_callable is None:
        loss_callable = lambda outputs, targets: rtdetr_detection_loss(
            outputs, targets, loss_cfg
        )
    precast_bf16 = getattr(model, "dtype", jnp.float32) == jnp.bfloat16

    fsdp_repl = fsdp_shard = None
    if mesh is not None and zero:
        from tamtr_tpu.parallel.mesh import flat_param_sharding

        if mesh.devices.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            fsdp_repl = NamedSharding(mesh, PartitionSpec())
            # over all mesh axes: 'data' on the 1-D mesh, (data, sp) jointly
            # on the 2-D sequence-parallel mesh
            fsdp_shard = flat_param_sharding(mesh)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        targets = {"cls": batch["cls"], "bboxes": batch["bboxes"], "mask": batch["mask"]}
        for extra in ("masks", "keypoints"):
            if extra in batch:
                targets[extra] = batch[extra]
        k_cdn, k_drop = jax.random.split(jax.random.fold_in(rng, state.step), 2)
        unravel = state.unravel

        # accept uint8 images and normalize on device: the host-side
        # `astype(float32)/255` costs ~4x the bytes in host CPU time AND
        # host->device transfer (the loader ships uint8)
        img = batch["img"]
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0

        def loss_fn(params):
            if precast_bf16:
                # pre-cast the bf16-consumed leaves (identity w.r.t. the
                # modules' own casts — see _bf16_consumed) so the converts
                # fuse into the unravel slices instead of one pathological
                # whole-vector retile
                params = precast_bf16_params(params)
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                img,
                batch["txt_feats"],
                targets,
                True,
                rngs={"cdn": k_cdn, "dropout": k_drop},
                mutable=["batch_stats"],
            )
            loss, items = loss_callable(outputs, targets)
            return loss, (items, mutated["batch_stats"])

        # Differentiate w.r.t. the STRUCTURED tree, with the flat->tree
        # unravel outside the grad: taking grad of the flat vector makes
        # every leaf's slice transpose into a pad-then-add on the whole (P,)
        # vector — profiled at ~76 ms/step of `pad_add` fusions at 42M
        # params. Tree-grad + one explicit concat is two bandwidth passes.
        p_flat = state.params
        if fsdp_repl is not None and unravel:
            # ZeRO: params live sharded over the 'data' axis; gather the
            # full vector ONCE for compute (XLA emits a single all-gather)
            p_flat = jax.lax.with_sharding_constraint(p_flat, fsdp_repl)
        params_tree = unravel(p_flat) if unravel else state.params
        (loss, (items, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params_tree)
        if unravel:
            grads = flatten_tree(grads)
            if fsdp_shard is not None:
                # drop the replicated flat gradient onto the sharded layout
                # (XLA turns the batch-axis psum + this into reduce-scatter);
                # all optimizer/EMA math below then runs sharded
                grads = jax.lax.with_sharding_constraint(grads, fsdp_shard)
        gnorm = optax.global_norm(grads)
        if cfg.skip_nonfinite:
            # NaN guard without retaining old copies: zero the gradients and
            # the resulting updates on a non-finite step (a `where(ok, new,
            # old)` over params+opt doubles their memory and blocks buffer
            # donation). Optimizer moments still decay on a skipped step
            # (rare; harmless). `where`, not multiply: NaN*0 stays NaN.
            ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
            grads = jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            updates = jax.tree.map(lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates)
        else:
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # EMA update (reference decay ramp), ticking only on OPTIMIZER steps
        # like `ModelEMA.update` in `optimizer_step` (`trainer.py:471-479`).
        # No-step minibatches use d_eff=1 (identity) — arithmetic gating, not
        # `where(step, new, old)`, to keep buffer donation.
        if isinstance(new_opt, FlatOptState) and isinstance(state.opt_state, FlatOptState):
            stepped = (new_opt.count > state.opt_state.count).astype(jnp.float32)
            t = new_opt.count.astype(jnp.float32)
        else:
            stepped = jnp.float32(1.0)
            t = (state.step + 1).astype(jnp.float32)
        d_raw = cfg.ema_decay * (1.0 - jnp.exp(-t / cfg.ema_tau))
        d = 1.0 - stepped * (1.0 - d_raw)
        ema_p = jax.tree.map(lambda e, p: e * d + (1.0 - d) * p, state.ema_params, new_params)
        ema_b = jax.tree.map(lambda e, p: e * d + (1.0 - d) * p, state.ema_batch_stats, new_bs)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            ema_params=ema_p,
            ema_batch_stats=ema_b,
        )
        keys = [k for k in ("giou", "class", "bbox", "box", "cls", "dfl") if k in items]
        metrics = {
            "loss": loss,
            **{k: items[k] for k in keys},
            "grad_norm": gnorm,
        }
        return new_state, metrics

    return train_step
