"""Model serving: HTTP inference server + remote-model client.

TPU-native analogue of the reference's Triton-server serving path
(`ultralytics/utils/triton.py` TritonRemoteModel; routed from
`nn/autobackend.py:43` when the weights arg is a URL). The reference
delegates serving to an external Triton daemon speaking the KServe
protocol; here the server half is part of the framework — a thin
threaded HTTP server wrapping any loaded backend (the jitted JAX model,
a SavedModel, ...) so one TPU host can serve detections to remote
clients — and the client half mirrors the reference's API: construct
from a `<scheme>://<netloc>/<endpoint>` URL, introspect the model's
input names/dtypes from server metadata, call with numpy arrays, get
numpy arrays back.

Wire format: request/response bodies are `.npz` archives (named numpy
arrays) — self-describing shapes+dtypes with zero dependencies beyond
numpy. Endpoints:

  GET  /v1/models/<endpoint>           -> JSON metadata (inputs/outputs/nc)
  POST /v1/models/<endpoint>:infer     -> npz in, npz out

`AutoBackend` routes `http://...` weights to `RemoteModel`, so
`TAMTR("http://host:8000/tamtr").predict(...)` works like any local
checkpoint (reference parity: `nn/autobackend.py` `triton` row).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Dict, List, Optional, Sequence
from urllib.parse import urlsplit
from urllib.request import Request, urlopen

import numpy as np


def _pack_npz(arrays: Dict[str, np.ndarray]) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def _unpack_npz(body: bytes) -> Dict[str, np.ndarray]:
    data = np.load(io.BytesIO(body))
    return {k: data[k] for k in data.files}


class ModelServer:
    """Serve a callable model over HTTP (threaded, one process).

    Args:
      model: callable `(img, txt_feats) -> pred` on numpy arrays — an
        `AutoBackend`, or any function with the same contract.
      endpoint: model name in the URL path.
      meta: extra metadata merged into the `/v1/models/<endpoint>` reply.
      input_names/input_dtypes: advertised input signature (client casts
        to these dtypes before sending, like the reference's
        `np_input_formats`).
    """

    def __init__(
        self,
        model: Callable[..., np.ndarray],
        endpoint: str = "tamtr",
        host: str = "127.0.0.1",
        port: int = 0,
        meta: Optional[dict] = None,
        input_names: Sequence[str] = ("img", "txt_feats"),
        input_dtypes: Sequence[str] = ("float32", "float32"),
        max_request_bytes: int = 256 * 1024 * 1024,
    ) -> None:
        self.model = model
        self.endpoint = endpoint
        # bound upload size (batched 640px float image payloads are ~5 MB;
        # the default cap leaves generous headroom while preventing
        # arbitrary-size request bodies from exhausting memory)
        self.max_request_bytes = int(max_request_bytes)
        self.meta = {
            "name": endpoint,
            "inputs": [
                {"name": n, "dtype": d} for n, d in zip(input_names, input_dtypes)
            ],
            "outputs": [{"name": "pred", "dtype": "float32"}],
            **(meta or {}),
        }
        self._names = list(input_names)
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _reply(self, code: int, body: bytes, ctype: str) -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802
                if self.path.rstrip("/") == f"/v1/models/{server.endpoint}":
                    self._reply(
                        200, json.dumps(server.meta).encode(), "application/json"
                    )
                else:
                    self._reply(404, b"{}", "application/json")

            def do_POST(self):  # noqa: N802
                if self.path != f"/v1/models/{server.endpoint}:infer":
                    self._reply(404, b"{}", "application/json")
                    return
                n = int(self.headers.get("Content-Length", 0))
                if n > server.max_request_bytes:
                    self._reply(
                        413,
                        json.dumps(
                            {"error": f"request {n} B exceeds cap "
                                      f"{server.max_request_bytes} B"}
                        ).encode(),
                        "application/json",
                    )
                    return
                try:
                    arrays = _unpack_npz(self.rfile.read(n))
                    inputs = [arrays[k] for k in server._names]
                    pred = np.asarray(server.model(*inputs))
                    self._reply(
                        200, _pack_npz({"pred": pred}), "application/octet-stream"
                    )
                except Exception as e:  # noqa: BLE001 — surface to the client
                    self._reply(
                        400, json.dumps({"error": str(e)}).encode(), "application/json"
                    )

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread: Optional[threading.Thread] = None

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}/{self.endpoint}"

    def start(self) -> "ModelServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def serve_forever(self) -> None:
        self._httpd.serve_forever()

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)


class RemoteModel:
    """Client for a remote tamtr_tpu `ModelServer` (reference
    `utils/triton.py` TritonRemoteModel API).

    Construct from one URL `<scheme>://<netloc>/<endpoint>` or explicit
    parts; inputs are cast to the server-advertised dtypes; returns the
    output arrays cast back to the first input's dtype (reference
    behavior).
    """

    def __init__(self, url: str, endpoint: str = "", scheme: str = "") -> None:
        if not endpoint and not scheme:
            parts = urlsplit(url)
            endpoint = parts.path.strip("/").split("/")[0]
            scheme = parts.scheme
            url = parts.netloc
        self.endpoint = endpoint
        self.url = url
        self.scheme = scheme or "http"
        if self.scheme != "http":
            raise ValueError(
                f"unsupported scheme {self.scheme!r}: the tamtr_tpu server speaks http"
            )
        self._base = f"http://{self.url}/v1/models/{self.endpoint}"
        with urlopen(self._base, timeout=30) as r:
            self.meta = json.loads(r.read())
        self.input_names: List[str] = [x["name"] for x in self.meta["inputs"]]
        self.np_input_formats = [np.dtype(x["dtype"]) for x in self.meta["inputs"]]
        self.output_names: List[str] = [x["name"] for x in self.meta["outputs"]]

    def __call__(self, *inputs: np.ndarray) -> List[np.ndarray]:
        out_format = inputs[0].dtype
        arrays = {}
        for name, dt, x in zip(self.input_names, self.np_input_formats, inputs):
            arrays[name] = np.asarray(x, dtype=dt)
        req = Request(
            f"{self._base}:infer",
            data=_pack_npz(arrays),
            headers={"Content-Type": "application/octet-stream"},
            method="POST",
        )
        with urlopen(req, timeout=300) as r:
            if r.status != 200:
                raise RuntimeError(f"inference failed: HTTP {r.status}")
            out = _unpack_npz(r.read())
        return [out[k].astype(out_format) for k in self.output_names]


def serve_checkpoint(
    weights: str,
    endpoint: str = "tamtr",
    host: str = "127.0.0.1",
    port: int = 8000,
    nc: Optional[int] = None,
    imgsz: int = 640,
) -> ModelServer:
    """Load weights via AutoBackend and serve them (helper for the CLI
    `yolo serve` analogue). Returns the constructed (NOT yet serving)
    server — call `.start()` for a background thread or `.serve_forever()`
    to block. The server is unauthenticated; it binds loopback by default —
    pass host="0.0.0.0" explicitly to expose it on all interfaces."""
    from tamtr_tpu.nn.autobackend import AutoBackend

    backend = AutoBackend(weights, nc=nc, imgsz=imgsz)
    backend.warmup()
    meta = {"nc": backend.nc, "imgsz": imgsz, "backend": backend.backend}
    return ModelServer(backend, endpoint=endpoint, host=host, port=port, meta=meta)
