"""YAML model-graph front-end and the full TAM-TR model.

The reference compiles its architecture from a YAML DSL
(`ultralytics/nn/tasks.py:parse_model`, lines 841-974). We keep the same
`[from, repeats, module, args]` schema — a core capability of the framework —
but lower it to a *static layer spec* (hashable tuples) that a single flax
module executes as a topological loop. Channel threading is unnecessary:
flax infers input channels from shapes at init.

`TAMTRModel` is the task model (reference `RTDETRDetectionWorldModel`,
`nn/tasks.py:518-672`): backbone + BTA-PAN neck feeding text guidance into
every TIAGELAN, then the ManbaWorldDecoder head.
"""

from __future__ import annotations

import importlib.resources
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import yaml
from flax import linen as nn

from tamtr_tpu.nn import layers as L
from tamtr_tpu.nn.decoder import ManbaWorldDecoder

# module-name registry (YAML name -> builder)
_MODULES = {
    "Conv",
    "RepNCSPELAN4",
    "SPPELAN",
    "ADown",
    "TIAGELAN",
    "CPAM",
    "Concat",
    "nn.Upsample",
    "Silence",
}


def load_model_yaml(path: str | Path) -> Dict[str, Any]:
    p = Path(path)
    if not p.exists():
        # look up bundled configs
        cand = Path(__file__).resolve().parent.parent / "cfg" / "models" / p.name
        if cand.exists():
            p = cand
        else:
            raise FileNotFoundError(f"model yaml not found: {path}")
    with open(p) as f:
        return yaml.safe_load(f)


def parse_graph(cfg: Dict[str, Any], nc: Optional[int] = None):
    """Lower the YAML graph to (layer_specs, head_spec, save_set).

    Each layer spec is (idx, from, module, args) with hashable args.
    """
    nc = nc if nc is not None else int(cfg.get("nc", 80))
    gd = float(cfg.get("depth_multiple", 1.0))
    gw = float(cfg.get("width_multiple", 1.0))
    entries = list(cfg["backbone"]) + list(cfg["head"])

    specs = []
    head_spec = None
    head_type = None
    save = set()
    n_layers = len(entries)
    for i, (f, n, m, args) in enumerate(entries):
        n = max(round(n * gd), 1) if n > 1 else n
        args = [nc if a == "nc" else a for a in args]
        args = [tuple(a) if isinstance(a, list) else a for a in args]  # hashable
        if m in (
            "ManbaWorldDecoder", "RTDETRDecoder", "ManbaDecoder",
            "DecouplingManbaWorldDecoder", "DecouplingDFLManbaWorldDecoder",
            "locationManbaDecoder", "DualRTDETRDecoder",
            "Detect", "Segment", "Pose", "Classify",
        ):
            assert i == n_layers - 1, "head must be last"
            head_spec = (tuple(f), tuple(args))
            head_type = m
            for j in f:
                save.add(j if j >= 0 else i + j)
            continue
        if isinstance(f, list):
            froms = tuple(j if j < 0 else j for j in f)
            for j in f:
                if j != -1:
                    save.add(j if j >= 0 else i + j)
            f_field = froms
        else:
            if f != -1:
                save.add(f if f >= 0 else i + f)
            f_field = f
        if m == "Conv" and gw != 1.0:
            args = [_make_divisible(args[0] * gw, 8)] + args[1:]
        specs.append((i, f_field, m, tuple(args)))
    assert head_spec is not None, "graph must end with a detection head"
    return tuple(specs), head_spec, tuple(sorted(save)), nc, head_type


def _make_divisible(x, divisor):
    import math

    return math.ceil(x / divisor) * divisor


def _build_module(m: str, args: Tuple, name: str, deploy: bool = False):
    if m == "Conv":
        c2, k, s = (list(args) + [1, 1])[:3]
        return L.ConvBN(c2, k, s, name=name)
    if m == "RepNCSPELAN4":
        c2, c3, c4, n = args
        return L.RepNCSPELAN4(c2, c3, c4, n, deploy=deploy, name=name)
    if m == "SPPELAN":
        c2, c3 = args
        return L.SPPELAN(c2, c3, name=name)
    if m == "ADown":
        return L.ADown(args[0], name=name)
    if m == "TIAGELAN":
        c2, c3, c4, n, nh = args
        return L.TIAGELAN(c2, c3, c4, n, nh, deploy=deploy, name=name)
    if m == "CPAM":
        return L.CPAM(name=name)
    if m == "AIFI":
        cm, nh = (list(args) + [2048, 8])[:2] if args else (2048, 8)
        return L.AIFI(cm=cm, num_heads=nh, name=name)
    if m == "Concat":
        return L.Concat(name=name)
    if m == "nn.Upsample":
        scale = float(args[1])
        return L.Upsample(scale, name=name)
    if m == "Silence":
        return L.Silence(name=name)
    if m == "CBLinear":
        c2s = tuple(args[0])
        k, s = (list(args[1:]) + [1, 1])[:2]
        return L.CBLinear(c2s, k, s, name=name)
    if m == "CBFuse":
        return L.CBFuse(tuple(args[0]), name=name)
    raise ValueError(f"unknown module {m}")


class TAMTRModel(nn.Module):
    """Full TAM-TR detector: graph layers + MEH head.

    Inputs are NHWC float images (already normalized to [0, 1]) and
    per-batch text features (B, K, 512). In training mode, `targets` carries
    padded ground truth for the CDN denoising branch.
    """

    specs: Tuple
    head_from: Tuple[int, ...]
    head_args: Tuple
    save: Tuple[int, ...]
    nc: int
    head_type: str = "ManbaWorldDecoder"
    max_gt: int = 128
    scan_chunk: int = 128
    # CDN denoising budget (reference `num_denoising=100`, head.py:1015);
    # dn group count = max(1, num_denoising // max_gt)
    num_denoising: int = 100
    # per-level VSS DropPath rate (reference head.py:1034-1035); 0 disables
    # the stochastic depth (useful for cross-framework train-mode parity)
    vss_drop_path: float = 0.1
    wire_text_attn: bool = False
    # deploy=True switches RepConvN blocks to their fused single-conv form
    # (params from `tamtr_tpu.nn.fuse.fuse_repconv_variables`)
    deploy: bool = False
    # rematerialize each graph layer (and the head's VSS mixers) in the
    # backward pass: the un-remat'ed grad graph needs ~14 GB of activation
    # temps at 640px batch 4 — past single-chip HBM once optimizer state is
    # resident. remat trades ~30% recompute for O(layer-input) memory.
    remat: bool = False
    # size-aware selective remat: only wrap a layer in remat when its input
    # activation carries >= this many elements per batch item (H*W*C).
    # Measured on the real chip at 640px b4 max_gt=300: full remat (0) is
    # FASTEST — 697 ms vs 711 ms (2**21) vs 733 ms (2**22) — because the
    # backward is HBM-bound, not recompute-bound, and skipping remat grows
    # peak temps 5.5 -> 11.3 GiB. Keep 0; the knob exists for smaller
    # images / future chips where the trade may invert.
    remat_min_elems: int = 0
    # compute dtype for convs/attention; BN stats, the selective scan, and
    # the loss stay fp32 (the reference trains amp=False — bf16 here is a
    # TPU-native speed option, off by default)
    dtype: Any = jnp.float32

    @property
    def uses_text(self) -> bool:
        """True when the head consumes text embeddings (contrastive scores)."""
        return self.head_type in (
            "ManbaWorldDecoder",
            "DecouplingManbaWorldDecoder",
            "DecouplingDFLManbaWorldDecoder",
        ) and (len(self.head_args) <= 6 or bool(self.head_args[6]))

    @classmethod
    def from_yaml(cls, path: str | Path, nc: Optional[int] = None, **kw) -> "TAMTRModel":
        cfg = load_model_yaml(path)
        specs, head_spec, save, nc_, head_type = parse_graph(cfg, nc)
        return cls(
            specs=specs, head_from=head_spec[0], head_args=head_spec[1], save=save,
            nc=nc_, head_type=head_type, **kw,
        )

    @nn.compact
    def __call__(
        self,
        img: jnp.ndarray,
        txt_feats: jnp.ndarray,
        targets: Optional[Dict[str, jnp.ndarray]] = None,
        train: bool = False,
        features_only: bool = False,
    ):
        if txt_feats.shape[0] != img.shape[0]:
            txt_feats = jnp.broadcast_to(
                txt_feats, (img.shape[0],) + txt_feats.shape[1:]
            )
        x = img.astype(self.dtype)
        txt_feats = txt_feats.astype(self.dtype)
        y: List[Optional[jnp.ndarray]] = []
        for idx, f, m, args in self.specs:
            if isinstance(f, tuple):
                inp = [x if j == -1 else y[j if j >= 0 else idx + j] for j in f]
            elif f == -1:
                inp = x
            else:
                inp = y[f]
            mod = _build_module(
                m, args, name=f"m{idx}_{m.replace('.', '_')}", deploy=self.deploy
            )
            heavy = m not in ("Concat", "Silence", "nn.Upsample", "CBFuse")
            if heavy and self.remat_min_elems:
                ref = inp[0] if isinstance(inp, list) else inp
                per_item = int(np.prod(ref.shape[1:]))
                heavy = per_item >= self.remat_min_elems
            if m == "TIAGELAN":
                if self.remat and heavy:
                    x = nn.remat(lambda mdl, a, g: mdl(a, g, train))(mod, inp, txt_feats)
                else:
                    x = mod(inp, txt_feats, train)
            elif self.remat and heavy:
                x = nn.remat(lambda mdl, a: mdl(a, train))(mod, inp)
            else:
                x = mod(inp, train)
            y.append(x if idx in self.save else None)

        feats = [y[j] for j in self.head_from]
        if features_only:
            return feats
        if self.head_type == "Detect":
            from tamtr_tpu.nn.yolo_head import Detect

            return Detect(nc=self.nc, name="head")(feats, train)
        if self.head_type == "Segment":
            from tamtr_tpu.nn.yolo_head import Segment

            return Segment(nc=self.nc, name="head")(feats, train)
        if self.head_type == "Pose":
            from tamtr_tpu.nn.yolo_head import Pose

            kpt = tuple(self.head_args[1]) if len(self.head_args) > 1 else (17, 3)
            return Pose(nc=self.nc, kpt_shape=kpt, name="head")(feats, train)
        if self.head_type == "Classify":
            from tamtr_tpu.nn.yolo_head import Classify

            return Classify(nc=self.nc, name="head")(feats, train)
        nc_h, hd, nq, ndp, nh, ndl = self.head_args[:6]
        if self.head_type == "locationManbaDecoder":
            from tamtr_tpu.nn.decoder import LocationManbaDecoder

            head = LocationManbaDecoder(
                nc=self.nc, ch=tuple(f.shape[-1] for f in feats), hd=hd, nq=nq,
                ndp=ndp, nh=nh, ndl=ndl, max_gt=self.max_gt,
                num_denoising=self.num_denoising, scan_chunk=self.scan_chunk,
                name="head",
            )
            return head(feats, txt_feats, targets, train)
        if self.head_type == "DualRTDETRDecoder":
            # reference `head.py:438-722`: split the (dual-pyramid) levels
            # into two halves and decode each with ONE SHARED decoder
            half = len(feats) // 2
            core = ManbaWorldDecoder(
                nc=self.nc, ch=tuple(f.shape[-1] for f in feats[:half]),
                hd=hd, nq=nq, ndp=ndp, nh=nh, ndl=ndl, max_gt=self.max_gt,
                scan_chunk=self.scan_chunk, num_denoising=self.num_denoising,
                use_text=False, use_vss=False, name="head",
            )
            out1 = core(feats[:half], txt_feats, targets, train)
            out2 = core(feats[half:], txt_feats, targets, train)
            if not train:
                return {"pred": [out1["pred"], out2["pred"]], "dual": (out1, out2)}
            return {"dual": (out1, out2), **out1}
        variant = "base"
        if self.head_type == "RTDETRDecoder":
            # plain RT-DETR decoder (reference `head.py:174-436`): same
            # deformable decoder + CDN machinery, no VSS mixers, Linear heads
            use_text, use_vss = False, False
        elif self.head_type == "ManbaDecoder":
            # text-free MEH head (reference `head.py:723-1003`)
            use_text, use_vss = False, True
        else:
            use_text = bool(self.head_args[6]) if len(self.head_args) > 6 else True
            use_vss = True
            if self.head_type == "DecouplingManbaWorldDecoder":
                variant = "decouple"  # reference head.py:1630-1955
            elif self.head_type == "DecouplingDFLManbaWorldDecoder":
                variant = "dfl"  # reference head.py:1957-2244
        head = ManbaWorldDecoder(
            nc=self.nc,
            ch=tuple(f.shape[-1] for f in feats),
            hd=hd,
            nq=nq,
            ndp=ndp,
            nh=nh,
            ndl=ndl,
            max_gt=self.max_gt,
            scan_chunk=self.scan_chunk,
            num_denoising=self.num_denoising,
            use_text=use_text,
            use_vss=use_vss,
            variant=variant,
            remat=self.remat,
            vss_drop_path=self.vss_drop_path,
            name="head",
        )
        return head(feats, txt_feats, targets, train)
