"""TritonRemoteModel against an in-process KServe-v2 stub server.

The client speaks the HTTP protocol with the binary tensor extension
(reference utils/triton.py wraps tritonclient; ours is stdlib), so a
threaded http.server stands in for Triton: model metadata + /infer that
doubles its input tensor. The stub implements BOTH wire forms — binary
(JSON header + raw bytes, Inference-Header-Content-Length) and plain JSON —
and can be pinned to JSON-only to exercise the client's fallback.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest


class _StubTriton(BaseHTTPRequestHandler):
    binary_ok = True          # class flag: refuse binary requests when False

    def log_message(self, *a):
        pass

    def _send(self, obj, code=200, blob=b""):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body) + len(blob)))
        if blob:
            self.send_header("Inference-Header-Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body + blob)

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
        raw = self.rfile.read(n)
        hlen = self.headers.get("Inference-Header-Content-Length")
        if hlen is not None:                       # binary-extension request
            if not type(self).binary_ok:
                return self._send({"error": "binary not supported"}, 400)
            req = json.loads(raw[: int(hlen)].decode())
            blob, off, arrays = raw[int(hlen):], 0, []
            for inp in req["inputs"]:
                size = inp["parameters"]["binary_data_size"]
                arrays.append(np.frombuffer(
                    blob[off:off + size],
                    np.float32).reshape(inp["shape"]))
                off += size
            x = arrays[0]
            out0 = np.ascontiguousarray((x * 2), np.float32)
            out1 = np.arange(x.shape[0], dtype=np.int32)
            return self._send({"outputs": [
                {"name": "output0", "datatype": "FP32",
                 "shape": list(out0.shape),
                 "parameters": {"binary_data_size": out0.nbytes}},
                {"name": "output1", "datatype": "INT32",
                 "shape": [x.shape[0]],
                 "parameters": {"binary_data_size": out1.nbytes}},
            ]}, blob=out0.tobytes() + out1.tobytes())
        req = json.loads(raw.decode())             # plain JSON request
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


def _check_roundtrip(m):
    x = np.arange(8, dtype=np.float64).reshape(2, 4)   # wrong dtype on purpose
    out0, out1 = m(x)
    np.testing.assert_allclose(out0, x * 2)
    assert out0.dtype == np.float64        # float output -> caller float dtype
    assert out1.dtype == np.int32          # int output keeps server dtype
    assert out1[: int(out1[1])].shape == (1,)   # usable as a slice index
    np.testing.assert_array_equal(out1, [0, 1])


def test_triton_client_roundtrip_binary(stub_server):
    from yolo_sod_tpu.utils.triton import TritonRemoteModel

    _StubTriton.binary_ok = True
    m = TritonRemoteModel(stub_server)
    assert m.endpoint == "doubler"
    assert m.input_names == ["images"]
    assert m.output_names == ["output0", "output1"]    # alphabetical
    assert m.np_input_formats == [np.float32]
    assert m.metadata == {"imgsz": 64, "task": "detect"}
    _check_roundtrip(m)
    assert m.binary                                    # stayed on binary wire


def test_triton_client_json_fallback(stub_server):
    """A server without the binary extension 400s the first request; the
    client falls back to JSON tensors permanently and still round-trips."""
    from yolo_sod_tpu.utils.triton import TritonRemoteModel

    m = TritonRemoteModel(stub_server)
    _StubTriton.binary_ok = False
    try:
        _check_roundtrip(m)
        assert not m.binary
        _check_roundtrip(m)                            # second call: JSON path
    finally:
        _StubTriton.binary_ok = True


def test_triton_autobackend_route(stub_server):
    """AutoBackend routes URLs to the Triton client and returns (det, n)."""
    from yolo_sod_tpu.nn.autobackend import AutoBackend

    b = AutoBackend(stub_server)
    assert b.format == "triton"
    det, n = b.forward(np.ones((2, 4), np.float32))
    assert det.shape == (2, 4) and n.shape == (2,)
    assert np.issubdtype(np.asarray(n).dtype, np.integer)


def test_triton_grpc_rejected():
    from yolo_sod_tpu.utils.triton import TritonRemoteModel

    with pytest.raises(NotImplementedError):
        TritonRemoteModel("grpc://localhost:8001/foo")
