"""Port a reference TAM-TR torch checkpoint (.pt) into this framework.

Maps the reference's module tree (`/root/reference/ultralytics/nn/tasks.py`
graph order: `model.{i}.<submodules>`) onto our flax tree (`m{i}_<Module>/...`
+ `head/...`). The same YAML wiring means the mapping is purely structural:

- Conv blocks:  `X.conv.weight` -> `X/Conv_0/kernel` (OIHW->HWIO, incl.
  depthwise), `X.bn.{weight,bias}` -> `X/BatchNorm_0/{scale,bias}`,
  running stats -> batch_stats.
- ELAN children: `cv2.0/cv2.1` (Sequential[RepNCSP, Conv]) ->
  `cv2_csp/cv2_conv` (same for cv3); RepNCSP bottlenecks `m.{j}` -> `m{j}`.
- Head (`model.41` -> `head`): `input_proj.{i}.{0,1}` ->
  `input_proj{i}_{conv,bn}`, `VSSBlocks.{i}` -> `vss{i}`,
  `decoder.layers.{i}` -> `layer{i}` (nn.MultiheadAttention `in_proj_*`
  split into q/k/v), `enc_output.{0,1}` -> `enc_output_{dense,norm}`,
  `MLP.layers.{j}` -> `layers{j}`, score/bbox head lists indexed inline.
- SS2D stacked params: `A_logs (K*D, N)` -> `(K, D, N)`, `Ds (K*D,)` ->
  `(K, D)`; `x_proj_weight`/`dt_projs_*` copy as-is.
- Linear `weight` transposes (out,in)->(in,out); `denoising_class_embed`
  is an embedding table and does NOT transpose.

Usage (torch CPU; unpickling the reference classes uses tools/refstubs.py):
    python tools/port_torch_weights.py TAM_TR.pt out_dir/   # torch -> flax
    python tools/port_torch_weights.py --export out_dir/ back.pt  # flax -> torch
Produces an orbax checkpoint {"params", "batch_stats"} loadable with
`TAMTR('tamtr.yaml').load(out_dir)`; `--export` is the exact inverse and
writes a reference-loadable .pt (round-trips bitwise, tests/test_port.py).

Validated by tests/test_port.py: 100% bidirectional name+shape coverage
against the reference module tree, plus numeric forward parity of the
ported backbone+neck (layers 0-40) on a fixed image.
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Any, Dict, List, Tuple

import numpy as np

_BN_LEAF = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}

# stacked SS2D params copied without transpose
_VERBATIM_LEAVES = {"x_proj_weight", "dt_projs_weight", "dt_projs_bias"}


def _convert(leaf_path: List[str], t: np.ndarray) -> np.ndarray:
    name = leaf_path[-1]
    if name in _VERBATIM_LEAVES or leaf_path[-2:] == ["attn", "bias"]:
        return t
    if leaf_path[-1] == "denoising_class_embed":
        return t  # embedding table, (nc+1, hd) already row-major
    if t.ndim == 4:  # conv OIHW -> HWIO (depthwise included)
        return np.transpose(t, (2, 3, 1, 0))
    if t.ndim == 2 and name == "kernel":
        return t.T  # linear (out, in) -> (in, out)
    return t


def map_torch_key(key: str, shape: Tuple[int, ...], layer_names: Dict[int, str],
                  head_index: int) -> List[Tuple[str, List[str], Any]]:
    """One torch state_dict key -> [(collection, flax path, transform)].

    `transform` is either None (use `_convert`) or a callable taking the
    tensor and returning a list of (collection, path, array) — used for the
    MultiheadAttention in_proj split and SS2D A_logs/Ds reshapes.
    """
    parts = key.split(".")
    if parts[0] != "model" or not parts[1].isdigit():
        return []
    idx = int(parts[1])
    rest = parts[2:]
    if rest and rest[-1] == "num_batches_tracked":
        return []
    prefix = "head" if idx == head_index else f"m{idx}_{layer_names[idx]}"

    out_path: List[str] = [prefix]
    collection = "params"
    i = 0
    special = None
    while i < len(rest):
        tok = rest[i]
        nxt = rest[i + 1] if i + 1 < len(rest) else None

        # ---- head-specific structures ----
        if prefix == "head":
            if tok == "input_proj":
                j, sub = rest[i + 1], rest[i + 2]
                if sub == "0":  # conv
                    out_path += [f"input_proj{j}_conv", "kernel"]
                else:  # bn
                    col, leaf = _BN_LEAF[rest[i + 3]]
                    collection = col
                    out_path += [f"input_proj{j}_bn", leaf]
                i = len(rest)
                continue
            if tok == "VSSBlocks":
                out_path.append(f"vss{rest[i + 1]}")
                i += 2
                continue
            if tok == "decoder" and nxt == "layers":
                out_path.append(f"layer{rest[i + 2]}")
                i += 3
                continue
            if tok == "self_attn" and nxt in ("in_proj_weight", "in_proj_bias"):
                leaf = "kernel" if nxt.endswith("weight") else "bias"

                def split_qkv(t, base=list(out_path) + ["self_attn"], leaf=leaf):
                    d = t.shape[0] // 3
                    outs = []
                    for name, sl in (("q_proj", slice(0, d)), ("k_proj", slice(d, 2 * d)),
                                     ("v_proj", slice(2 * d, 3 * d))):
                        piece = t[sl]
                        if piece.ndim == 2:
                            piece = piece.T
                        outs.append(("params", base + [name, leaf], piece))
                    return outs

                return [("params", out_path + ["self_attn"], split_qkv)]
            if tok in ("dec_score_head", "dec_bbox_head") and nxt and nxt.isdigit():
                out_path.append(f"{tok}{nxt}")
                i += 2
                continue
            if tok == "enc_output" and nxt in ("0", "1"):
                out_path.append("enc_output_dense" if nxt == "0" else "enc_output_norm")
                i += 2
                continue
            if tok == "layers" and nxt and nxt.isdigit():  # MLP lists
                out_path.append(f"layers{nxt}")
                i += 2
                continue
            if tok == "denoising_class_embed":
                out_path.append("denoising_class_embed")
                i = len(rest)
                continue
            if tok == "A_logs":
                def reshape_alogs(t, base=list(out_path)):
                    K = 4
                    return [("params", base + ["A_logs"], t.reshape(K, t.shape[0] // K, t.shape[1]))]

                return [("params", out_path + ["A_logs"], reshape_alogs)]
            if tok == "Ds":
                def reshape_ds(t, base=list(out_path)):
                    K = 4
                    return [("params", base + ["Ds"], t.reshape(K, t.shape[0] // K))]

                return [("params", out_path + ["Ds"], reshape_ds)]

        # ---- generic graph-module structures ----
        if tok in ("cv2", "cv3") and nxt in ("0", "1") and prefix != "head":
            out_path.append(f"{tok}_csp" if nxt == "0" else f"{tok}_conv")
            i += 2
            continue
        if tok == "m" and nxt and nxt.isdigit():  # RepNCSP bottleneck list
            out_path.append(f"m{nxt}")
            i += 2
            continue
        if tok == "conv" and nxt == "weight":
            out_path += ["Conv_0", "kernel"]
            i += 2
            continue
        if tok == "bn" and nxt in _BN_LEAF:
            col, leaf = _BN_LEAF[nxt]
            collection = col
            out_path += ["BatchNorm_0", leaf]
            i += 2
            continue
        if tok == "weight" and i == len(rest) - 1:
            # LayerNorm/BN scale (1-D) or Linear kernel (2-D)
            out_path.append("scale" if len(shape) == 1 else "kernel")
            i += 1
            continue
        out_path.append(tok)
        i += 1
    return [(collection, out_path, None)]


def port_state_dict(sd: Dict[str, np.ndarray], model) -> Tuple[Dict, Dict, Dict]:
    """Map a reference state_dict onto `model`'s variable tree.

    Returns (params, batch_stats, report). The report lists unmapped torch
    keys and missing flax leaves; both must be empty for a complete port.
    """
    import jax
    import jax.numpy as jnp

    layer_names = {idx: m.replace(".", "_") for idx, f, m, a in model.specs}
    head_index = max(layer_names) + 1 if layer_names else 0
    # the head is the last entry in the YAML (its index = last spec idx + 1)
    head_index = model.specs[-1][0] + 1

    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    unmapped: List[str] = []
    for k, v in sd.items():
        routes = map_torch_key(k, v.shape, layer_names, head_index)
        if not routes:
            if not k.endswith("num_batches_tracked"):
                unmapped.append(k)
            continue
        for collection, path, transform in routes:
            if transform is not None:
                emitted = transform(v)
            else:
                emitted = [(collection, path, _convert(path, v))]
            for col, p, arr in emitted:
                d = params if col == "params" else batch_stats
                for tok in p[:-1]:
                    d = d.setdefault(tok, {})
                d[p[-1]] = np.asarray(arr, np.float32)

    # validate against the model tree
    k = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 64, 64, 3))
    txt = jnp.zeros((1, max(model.nc, 1), 512))
    M = getattr(model, "max_gt", 8)  # CDN layout is tied to the model's max_gt
    tgt = {
        "cls": jnp.zeros((1, M), jnp.int32),
        "bboxes": jnp.full((1, M, 4), 0.5),
        "mask": jnp.zeros((1, M), bool),
    }
    shapes = jax.eval_shape(
        lambda: model.init({"params": k, "cdn": k, "dropout": k}, img, txt, tgt, True)
    )

    def flatten(tree, prefix=()):
        out = {}
        for kk, v in tree.items():
            if hasattr(v, "items"):
                out.update(flatten(v, prefix + (kk,)))
            else:
                out[prefix + (kk,)] = tuple(v.shape)
        return out

    want_p = flatten(shapes["params"])
    want_b = flatten(shapes.get("batch_stats", {}))
    got_p = flatten(params)
    got_b = flatten(batch_stats)
    report = {
        "unmapped_torch": unmapped,
        "missing_params": sorted("/".join(p) for p in want_p.keys() - got_p.keys()),
        "extra_params": sorted("/".join(p) for p in got_p.keys() - want_p.keys()),
        "missing_batch_stats": sorted("/".join(p) for p in want_b.keys() - got_b.keys()),
        "extra_batch_stats": sorted("/".join(p) for p in got_b.keys() - want_b.keys()),
        "shape_mismatch": sorted(
            f"{'/'.join(p)}: ours{want_p[p]} vs ported{got_p[p]}"
            for p in want_p.keys() & got_p.keys()
            if want_p[p] != got_p[p]
        ),
    }
    return params, batch_stats, report


def _tree_get(tree: Dict, path: List[str]):
    node = tree
    for tok in path:
        if not isinstance(node, dict) or tok not in node:
            return None
        node = node[tok]
    return node


def export_state_dict(
    params: Dict, batch_stats: Dict, model, template_sd: Dict[str, np.ndarray]
) -> Tuple[Dict[str, np.ndarray], Dict[str, List[str]]]:
    """Inverse port: our flax variables -> a reference-keyed state_dict.

    `template_sd` supplies the target key set and shapes (build the
    reference model on CPU via tools/refstubs.py and take its state_dict).
    Every transform in `map_torch_key` is inverted exactly (transposes,
    qkv merge, A_logs/Ds reshape), so port -> export round-trips bitwise.

    Returns (state_dict, report); report lists unexported template keys and
    shape mismatches — both must be empty for a complete export.
    """
    layer_names = {idx: m.replace(".", "_") for idx, f, m, a in model.specs}
    head_index = model.specs[-1][0] + 1

    sd: Dict[str, np.ndarray] = {}
    missing: List[str] = []
    mismatched: List[str] = []
    for key, tmpl in template_sd.items():
        if key.endswith("num_batches_tracked"):
            sd[key] = np.asarray(tmpl)  # torch-side counter, no flax twin
            continue
        routes = map_torch_key(key, tuple(tmpl.shape), layer_names, head_index)
        if not routes:
            missing.append(key)
            continue
        collection, path, transform = routes[0]
        tree = params if collection == "params" else batch_stats
        leaf = path[-1]
        if transform is not None:
            # the three structured specials, inverted
            if leaf == "self_attn":  # qkv merge
                base = path
                pieces = []
                for name in ("q_proj", "k_proj", "v_proj"):
                    p = _tree_get(params, base + [name, "kernel" if key.endswith("weight") else "bias"])
                    if p is None:
                        break
                    pieces.append(np.asarray(p).T if np.asarray(p).ndim == 2 else np.asarray(p))
                if len(pieces) != 3:
                    missing.append(key)
                    continue
                val = np.concatenate(pieces, axis=0)
            elif leaf in ("A_logs", "Ds"):
                p = _tree_get(params, path)
                if p is None:
                    missing.append(key)
                    continue
                p = np.asarray(p)
                val = p.reshape((-1,) + p.shape[2:])  # (K, D, ...) -> (K*D, ...)
            else:  # pragma: no cover - no other specials exist
                missing.append(key)
                continue
        else:
            p = _tree_get(tree, path)
            if p is None:
                missing.append(key)
                continue
            val = np.asarray(p)
            if not (
                leaf in _VERBATIM_LEAVES
                or path[-2:] == ["attn", "bias"]
                or leaf == "denoising_class_embed"
            ):
                if val.ndim == 4:  # HWIO -> OIHW
                    val = np.transpose(val, (3, 2, 0, 1))
                elif val.ndim == 2 and leaf == "kernel":
                    val = val.T
        if tuple(val.shape) != tuple(tmpl.shape):
            mismatched.append(f"{key}: template{tuple(tmpl.shape)} vs ours{tuple(val.shape)}")
            continue
        sd[key] = np.asarray(val, np.float32)
    return sd, {"missing": missing, "shape_mismatch": mismatched}


def export(ckpt_dir: str, out_pt: str, model_yaml: str = "tamtr.yaml", nc: int = 10) -> None:
    """Export an orbax checkpoint to a reference-loadable .pt file.

    The saved dict mirrors the reference checkpoint layout
    (`/root/reference/ultralytics/engine/trainer.py:422-447`): {"model":
    RTDETRDetectionWorldModel with our weights, "train_args": {}} — i.e. a
    user of the reference can `attempt_load_weights()` it unchanged.
    """
    import torch

    import orbax.checkpoint as ocp

    from tools.refstubs import install_reference_stubs

    install_reference_stubs()
    from ultralytics.nn.tasks import RTDETRDetectionWorldModel

    from tamtr_tpu.nn.graph import TAMTRModel

    ref = RTDETRDetectionWorldModel(
        "/root/reference/ultralytics/cfg/models/TAMTR/TAMTR.yaml", nc=nc, verbose=False
    )
    ref.eval()
    template = {k: v.float().numpy() for k, v in ref.state_dict().items()}

    restored = ocp.StandardCheckpointer().restore(Path(ckpt_dir).resolve())
    model = TAMTRModel.from_yaml(model_yaml, nc=nc)
    sd, report = export_state_dict(
        restored["params"], restored.get("batch_stats", {}), model, template
    )
    problems = {k: v for k, v in report.items() if v}
    if problems:
        for k, v in problems.items():
            print(f"{k}: {len(v)}; first: {v[:5]}")
        raise SystemExit("export incomplete — see report above")
    ref.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()}, strict=True)
    torch.save({"model": ref, "train_args": {}}, out_pt)
    print(f"exported {len(sd)} tensors -> {out_pt}")


def port(pt_path: str, out_dir: str, model_yaml: str = "tamtr.yaml") -> None:
    import torch

    from tools.refstubs import install_reference_stubs

    install_reference_stubs()  # unpickling needs the reference classes
    from tamtr_tpu.nn.graph import TAMTRModel

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    model_t = ckpt.get("ema") or ckpt.get("model") or ckpt
    sd = {k: v.float().numpy() for k, v in model_t.state_dict().items()}
    nc = int(getattr(model_t, "yaml", {}).get("nc", 10)) if hasattr(model_t, "yaml") else 10

    model = TAMTRModel.from_yaml(model_yaml, nc=nc)
    params, batch_stats, report = port_state_dict(sd, model)
    problems = {k: v for k, v in report.items() if v}
    if problems:
        for k, v in problems.items():
            print(f"{k}: {len(v)}; first: {v[:5]}")
        raise SystemExit("port incomplete — see report above")

    import orbax.checkpoint as ocp

    out = Path(out_dir).resolve()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out, {"params": params, "batch_stats": batch_stats}, force=True)
    ckptr.wait_until_finished()
    print(f"ported {len(sd)} tensors -> {out}")


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    if sys.argv[1] == "--export":
        export(*sys.argv[2:4])
    else:
        port(*sys.argv[1:3])
