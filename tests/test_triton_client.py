"""TritonRemoteModel against an in-process KServe-v2 stub server.

The client speaks the plain HTTP JSON protocol (reference utils/triton.py
wraps tritonclient; ours is stdlib), so a threaded http.server stands in for
Triton: model metadata + /infer that doubles its input tensor.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest


class _StubTriton(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _send(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/v2/models/doubler":
            self._send({
                "name": "doubler",
                "inputs": [{"name": "images", "datatype": "FP32",
                            "shape": [-1, 4]}],
                "outputs": [{"name": "output1", "datatype": "INT32",
                             "shape": [-1]},
                            {"name": "output0", "datatype": "FP32",
                             "shape": [-1, 4]}],
            })
        elif self.path == "/v2/models/doubler/config":
            self._send({"parameters": {"metadata": {
                "string_value": "{'imgsz': 64, 'task': 'detect'}"}}})
        else:
            self._send({"error": "not found"}, 404)

    def do_POST(self):
        if not self.path.endswith("/infer"):
            return self._send({"error": "bad path"}, 404)
        n = int(self.headers["Content-Length"])
        req = json.loads(self.rfile.read(n).decode())
        x = np.asarray(req["inputs"][0]["data"], np.float32).reshape(
            req["inputs"][0]["shape"])
        self._send({"outputs": [
            {"name": "output0", "datatype": "FP32", "shape": list(x.shape),
             "data": (x * 2).ravel().tolist()},
            {"name": "output1", "datatype": "INT32", "shape": [x.shape[0]],
             "data": list(range(x.shape[0]))},
        ]})


@pytest.fixture(scope="module")
def stub_server():
    srv = HTTPServer(("127.0.0.1", 0), _StubTriton)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/doubler"
    srv.shutdown()


def test_triton_client_roundtrip(stub_server):
    from yolo_sod_tpu.utils.triton import TritonRemoteModel

    m = TritonRemoteModel(stub_server)
    assert m.endpoint == "doubler"
    assert m.input_names == ["images"]
    assert m.output_names == ["output0", "output1"]    # alphabetical
    assert m.np_input_formats == [np.float32]
    assert m.metadata == {"imgsz": 64, "task": "detect"}

    x = np.arange(8, dtype=np.float64).reshape(2, 4)   # wrong dtype on purpose
    out0, out1 = m(x)
    np.testing.assert_allclose(out0, x * 2)
    assert out0.dtype == np.float64                    # cast back to caller dtype
    np.testing.assert_array_equal(out1.astype(int), [0, 1])


def test_triton_autobackend_route(stub_server):
    """AutoBackend routes URLs to the Triton client and returns (det, n)."""
    from yolo_sod_tpu.nn.autobackend import AutoBackend

    b = AutoBackend(stub_server)
    assert b.format == "triton"
    det, n = b.forward(np.ones((2, 4), np.float32))
    assert det.shape == (2, 4) and n.shape == (2,)


def test_triton_grpc_rejected():
    from yolo_sod_tpu.utils.triton import TritonRemoteModel

    with pytest.raises(NotImplementedError):
        TritonRemoteModel("grpc://localhost:8001/foo")
