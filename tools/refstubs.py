"""Import shims so the REFERENCE package (`/root/reference`) can be imported
on this image for weight porting and parity tests.

The reference's module tree pickles/constructs fine on CPU, but its imports
pull optional GPU-era deps (timm, torchvision, triton, fvcore, ...) that are
not installed here. These stubs satisfy the imports without changing any
behavior we rely on (we only construct modules / load state_dicts; the CUDA
selective-scan paths are never executed).
"""

from __future__ import annotations

import sys
import types


class _Any:
    def __getattr__(self, k):
        return _Any()

    def __call__(self, *a, **k):
        return _Any()

    def __getitem__(self, k):
        return _Any()


def _stub_pkg(name, attrs=None, any_attr=False):
    try:
        __import__(name)
        return sys.modules[name]
    except ImportError:
        pass
    mod = types.ModuleType(name)
    mod.__path__ = []
    for a, v in (attrs or {}).items():
        setattr(mod, a, v)
    if any_attr:
        mod.__getattr__ = lambda k: _Any()
    sys.modules[name] = mod
    return mod


def install_scan_oracle() -> None:
    """Replace the reference's CUDA selective-scan bindings with a naive
    torch recurrence so the ENTIRE reference forward runs on CPU.

    The reference has no non-CUDA path for the S6 scan (every FORWARD_TYPES
    entry binds a CUDA-extension Function, reference `vmamba.py:404-426`;
    imports `csms6s.py:113-134`). This oracle implements the exact kernel
    contract (`csms6s.py:229-293`): h_t = exp(dt*A)*h_{t-1} + dt*B*u_t;
    y_t = C_t.h_t + D*u_t, with optional delta bias + softplus — making the
    full reference `RTDETRDetectionWorldModel.predict` a CPU test oracle
    for head-inclusive ported-weights parity.
    """
    import torch
    import torch.nn.functional as F

    def naive_scan(u, delta, A, B, C, D=None, delta_bias=None,
                   delta_softplus=False, *unused):
        # u, delta: (b, d, l); A: (d, n); B, C: (b, k, n, l); D/bias: (d,)
        u = u.float()
        delta = delta.float()
        b, d, l = u.shape
        n = A.shape[1]
        k = B.shape[1]
        dim = d // k
        if delta_bias is not None:
            delta = delta + delta_bias.float().view(1, d, 1)
        if delta_softplus:
            delta = F.softplus(delta)
        Bm = B.float().unsqueeze(2).expand(b, k, dim, n, l).reshape(b, d, n, l)
        Cm = C.float().unsqueeze(2).expand(b, k, dim, n, l).reshape(b, d, n, l)
        dA = torch.exp(delta.unsqueeze(2) * A.float().view(1, d, n, 1))
        dBu = delta.unsqueeze(2) * Bm * u.unsqueeze(2)
        h = torch.zeros(b, d, n, dtype=torch.float32)
        ys = []
        for t in range(l):
            h = dA[..., t] * h + dBu[..., t]
            ys.append((h * Cm[..., t]).sum(-1))
        y = torch.stack(ys, dim=-1)
        if D is not None:
            y = y + D.float().view(1, d, 1) * u
        return y

    from ultralytics.nn.extra_modules.VManba import csms6s

    for cls_name in ("SelectiveScanCore", "SelectiveScanOflex", "SelectiveScanMamba"):
        cls = getattr(csms6s, cls_name, None)
        if cls is not None:
            cls.apply = staticmethod(naive_scan)


def install_reference_stubs(reference_path: str = "/root/reference") -> None:
    """Make `import ultralytics` (the reference fork) work on this image."""
    import torch

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0, scale_by_keep=True):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # eval semantics (identity)
            return x

    tl_attrs = {"DropPath": DropPath, "trunc_normal_": torch.nn.init.trunc_normal_}
    _stub_pkg("timm", {"create_model": lambda *a, **k: None, "list_models": lambda *a, **k: []})
    _stub_pkg("timm.layers", tl_attrs)
    _stub_pkg("timm.models", {})
    _stub_pkg("timm.models.layers", tl_attrs)
    tv = _stub_pkg("torchvision", {})
    _stub_pkg("torchvision.ops", {"nms": lambda *a, **k: None})
    _stub_pkg("torchvision.transforms", {}, any_attr=True)
    _stub_pkg("torchvision.datasets", {"ImageFolder": object})
    tv.ops = sys.modules["torchvision.ops"]
    tv.transforms = sys.modules["torchvision.transforms"]
    tv.datasets = sys.modules["torchvision.datasets"]
    fv = _stub_pkg("fvcore", {})
    _stub_pkg(
        "fvcore.nn",
        {"FlopCountAnalysis": None, "flop_count_str": None, "flop_count": None,
         "parameter_count": None},
    )
    fv.nn = sys.modules["fvcore.nn"]
    tr = _stub_pkg("triton", {})
    tr.jit = lambda fn=None, **kw: fn if callable(fn) else (lambda f: f)
    trl = _stub_pkg("triton.language", {}, any_attr=True)
    tr.language = trl
    for name in ("thop", "clip", "seaborn", "sentry_sdk"):
        _stub_pkg(name, {}, any_attr=True)
    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
