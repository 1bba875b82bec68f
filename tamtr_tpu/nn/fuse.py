"""Deploy-time parameter fusion (reference `switch_to_deploy` / `fuse()`).

Two transforms over the model's variables pytree:

- `fuse_repconv_variables`: collapse every RepConvN's 3x3+1x1 dual branch
  into one biased 3x3 conv (reference `extra_modules/block.py:61-125`,
  `get_equivalent_kernel_bias`). The fused model is built with
  `TAMTRModel.from_yaml(..., deploy=True)`.
- BN folding into the *preceding* conv is left to XLA: under jit, eval-mode
  BatchNorm is an affine map that XLA constant-folds into the conv weights,
  so a manual `fuse_conv_and_bn` pass (reference `torch_utils.py:159-206`)
  would not change the compiled program. RepConvN is the one case XLA cannot
  fuse (two parallel convs of different kernel size), hence this transform.

Conv kernels are flax NHWC layout: (kh, kw, cin, cout).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

BN_EPS = 1e-3  # must match tamtr_tpu.nn.layers.BN_EPS


def _fold_bn(
    kernel: np.ndarray, bn_params: Dict[str, Any], bn_stats: Dict[str, Any]
) -> Tuple[np.ndarray, np.ndarray]:
    """Fold eval-mode BN into a bias-free conv: returns (kernel', bias')."""
    gamma = np.asarray(bn_params["scale"], np.float32)
    beta = np.asarray(bn_params["bias"], np.float32)
    mean = np.asarray(bn_stats["mean"], np.float32)
    var = np.asarray(bn_stats["var"], np.float32)
    std = np.sqrt(var + BN_EPS)
    w = np.asarray(kernel, np.float32) * (gamma / std)  # broadcast over cout
    b = beta - mean * gamma / std
    return w, b


def _is_repconv(params_node: Any) -> bool:
    """A RepConvN params subtree has exactly the two ConvBN branches."""
    if not isinstance(params_node, dict):
        return False
    if set(params_node.keys()) != {"conv1", "conv2"}:
        return False
    for br in ("conv1", "conv2"):
        sub = params_node[br]
        if not isinstance(sub, dict) or set(sub.keys()) != {"Conv_0", "BatchNorm_0"}:
            return False
    k1 = params_node["conv1"]["Conv_0"]["kernel"]
    k2 = params_node["conv2"]["Conv_0"]["kernel"]
    return k1.shape[:2] == (3, 3) and k2.shape[:2] == (1, 1)


def _fuse_node(params_node: Dict, stats_node: Dict) -> Dict[str, np.ndarray]:
    """Fuse one RepConvN: fused 3x3 kernel + bias (1x1 padded into center)."""
    w3, b3 = _fold_bn(
        params_node["conv1"]["Conv_0"]["kernel"],
        params_node["conv1"]["BatchNorm_0"],
        stats_node["conv1"]["BatchNorm_0"],
    )
    w1, b1 = _fold_bn(
        params_node["conv2"]["Conv_0"]["kernel"],
        params_node["conv2"]["BatchNorm_0"],
        stats_node["conv2"]["BatchNorm_0"],
    )
    w1_padded = np.zeros_like(w3)
    w1_padded[1, 1] = w1[0, 0]
    return {"fused": {"kernel": w3 + w1_padded, "bias": b3 + b1}}


def fuse_repconv_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Transform train-layout variables into deploy-layout variables.

    Walks params/batch_stats in lockstep; every RepConvN subtree becomes
    {'fused': {kernel, bias}} in params and is dropped from batch_stats.
    All other leaves pass through unchanged.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(p_node: Any, s_node: Any):
        if _is_repconv(p_node):
            return _fuse_node(p_node, s_node), None
        if isinstance(p_node, dict):
            new_p, new_s = {}, {}
            for k, v in p_node.items():
                sp, ss = walk(v, s_node.get(k, {}) if isinstance(s_node, dict) else {})
                new_p[k] = sp
                if ss is not None and ss != {}:
                    new_s[k] = ss
            # keep batch_stats entries that have no params twin (pure-BN nodes)
            if isinstance(s_node, dict):
                for k, v in s_node.items():
                    if k not in p_node:
                        new_s[k] = v
            return new_p, new_s
        return p_node, s_node

    new_params, new_stats = walk(params, stats)
    out = dict(variables)
    out["params"] = new_params
    if "batch_stats" in variables:
        out["batch_stats"] = new_stats if new_stats is not None else {}
    # device-resident output: host numpy leaves would re-upload the whole
    # tree on every apply (measured 4.5x slower end to end)
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.asarray, out)
