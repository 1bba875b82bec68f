"""Serving: ModelServer + RemoteModel + AutoBackend URL routing (reference
`utils/triton.py` TritonRemoteModel / `nn/autobackend.py` triton row)."""

import numpy as np
import pytest


def _stub_model(img, txt):
    # deterministic function of both inputs so the round-trip is checkable
    B = img.shape[0]
    pred = np.zeros((B, 5, 4 + txt.shape[1]), np.float32)
    pred[:, :, 0] = img.mean(axis=(1, 2, 3), keepdims=False)[:, None]
    pred[:, :, 4:] = txt.mean(axis=2)[:, None, :]
    return pred


@pytest.fixture(scope="module")
def server():
    from tamtr_tpu.serve import ModelServer

    srv = ModelServer(_stub_model, endpoint="stub", meta={"nc": 3}).start()
    yield srv
    srv.stop()


def test_remote_model_roundtrip(server):
    from tamtr_tpu.serve import RemoteModel

    rm = RemoteModel(server.url)
    assert rm.endpoint == "stub"
    assert rm.input_names == ["img", "txt_feats"]
    assert rm.output_names == ["pred"]
    img = np.full((2, 8, 8, 3), 0.25, np.float64)  # wrong dtype: client casts
    txt = np.ones((2, 3, 512), np.float32)
    (out,) = rm(img, txt)
    assert out.dtype == np.float64  # cast back to first input's dtype
    expect = _stub_model(img.astype(np.float32), txt)
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_remote_model_explicit_parts(server):
    from tamtr_tpu.serve import RemoteModel

    rm = RemoteModel(f"{server.host}:{server.port}", endpoint="stub", scheme="http")
    assert rm.meta["nc"] == 3
    with pytest.raises(ValueError):
        RemoteModel(f"{server.host}:{server.port}", endpoint="stub", scheme="grpc")


def test_autobackend_url_route(server):
    from tamtr_tpu.nn.autobackend import AutoBackend

    ab = AutoBackend(server.url, imgsz=8)
    assert ab.backend == "remote"
    assert ab.nc == 3  # from server metadata
    img = np.full((1, 8, 8, 3), 0.5, np.float32)
    txt = np.zeros((1, 3, 512), np.float32)
    out = ab(img, txt)
    np.testing.assert_allclose(out, _stub_model(img, txt), atol=1e-6)


def test_server_rejects_bad_request(server):
    import json
    from urllib.request import Request, urlopen
    from urllib.error import HTTPError

    url = f"http://{server.host}:{server.port}/v1/models/stub:infer"
    req = Request(url, data=b"not-an-npz", method="POST")
    with pytest.raises(HTTPError) as ei:
        urlopen(req, timeout=10)
    assert ei.value.code == 400
    assert "error" in json.loads(ei.value.read())
