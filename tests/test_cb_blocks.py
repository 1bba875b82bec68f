"""CBLinear / CBFuse (YOLOv9 auxiliary blocks, reference
`extra_modules/block.py:316-338`): numeric parity with the reference torch
modules and graph-DSL integration."""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = Path("/root/reference")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_cblinear_cbfuse_parity_vs_reference():
    if not REF.exists():
        pytest.skip("reference tree unavailable")
    torch = pytest.importorskip("torch")
    torch.set_num_threads(1)
    from tools.refstubs import install_reference_stubs

    install_reference_stubs(str(REF))
    from ultralytics.nn.extra_modules.block import CBFuse as RefCBFuse
    from ultralytics.nn.extra_modules.block import CBLinear as RefCBLinear

    from tamtr_tpu.nn.layers import CBFuse, CBLinear

    rng = np.random.default_rng(0)
    c1, c2s = 16, (8, 12)
    x8 = rng.standard_normal((2, 8, 8, c1)).astype(np.float32)   # stride-8-ish
    x4 = rng.standard_normal((2, 16, 16, 12)).astype(np.float32)  # finer level

    ref_lin = RefCBLinear(c1, list(c2s)).eval()
    lin = CBLinear(c2s)
    params = lin.init(jax.random.PRNGKey(0), jnp.asarray(x8))
    # port torch OIHW conv -> flax HWIO
    w = ref_lin.conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    b = ref_lin.conv.bias.detach().numpy()
    params = {"params": {"conv": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}}
    outs = lin.apply(params, jnp.asarray(x8))
    with torch.no_grad():
        ref_outs = ref_lin(torch.from_numpy(x8.transpose(0, 3, 1, 2)))
    assert len(outs) == len(ref_outs) == 2
    for o, r in zip(outs, ref_outs):
        np.testing.assert_allclose(
            np.asarray(o).transpose(0, 3, 1, 2), r.numpy(), atol=1e-5
        )

    # CBFuse: earlier inputs are CBLinear tuples, last is a plain map
    fuse = CBFuse((1,))  # pick the 12-channel split from the tuple
    fused = fuse.apply({}, [outs, jnp.asarray(x4)])
    with torch.no_grad():
        ref_fused = RefCBFuse([1])(
            [ref_outs, torch.from_numpy(x4.transpose(0, 3, 1, 2))]
        )
    np.testing.assert_allclose(
        np.asarray(fused).transpose(0, 3, 1, 2), ref_fused.numpy(), atol=1e-5
    )


def test_cb_blocks_in_graph_dsl(tmp_path):
    """A user yaml wiring CBLinear -> CBFuse parses and runs end to end."""
    import yaml

    from tamtr_tpu.nn.graph import TAMTRModel

    cfg = {
        "nc": 3,
        "backbone": [
            [-1, 1, "Conv", [8, 3, 2]],     # 0: /2
            [-1, 1, "Conv", [16, 3, 2]],    # 1: /4
            [-1, 1, "Conv", [32, 3, 2]],    # 2: /8
        ],
        "head": [
            [2, 1, "CBLinear", [[16, 32]]],            # 3: split from /8
            [1, 1, "Conv", [16, 3, 1]],                # 4: /4 lateral
            [[3, 4], 1, "CBFuse", [[0]]],              # 5: fuse 16-ch split into /4
            [-1, 1, "Conv", [32, 3, 2]],               # 6: /8
            [[5, 6], 1, "ManbaWorldDecoder", [3, 32, 10, 2, 4, 2]],
        ],
    }
    p = tmp_path / "cb.yaml"
    p.write_text(yaml.safe_dump(cfg))
    model = TAMTRModel.from_yaml(p, nc=3, max_gt=4, scan_chunk=16)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    txt = jnp.zeros((1, 3, 32), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "cdn": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, img, txt, None, False)
    out = model.apply(variables, img, txt, None, False)
    assert out["pred"].shape == (1, 10, 4 + 3)
    assert bool(jnp.isfinite(out["pred"]).all())
