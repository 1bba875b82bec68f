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
