"""Remote Triton Inference Server client (KServe Predict-Protocol v2).

Analog of reference utils/triton.py:9 (TritonRemoteModel, 93 LoC). The
reference wraps the `tritonclient` package; that dependency is not in this
image, and the HTTP flavor of the protocol is a small, stable JSON+binary
REST surface — so this client speaks KServe v2 directly over stdlib
`urllib`, which also makes it testable against an in-process stub server
(tests/test_triton_client.py). Endpoints used:

    GET  /v2/models/<name>                  — model metadata (inputs/outputs)
    GET  /v2/models/<name>/config           — Triton config (metadata params)
    POST /v2/models/<name>/infer            — inference

Tensors travel via the KServe v2 **binary data extension** (the same wire
format tritonclient uses): the request body is the JSON header followed by
the raw little-endian tensor bytes, sized by an `Inference-Header-Content-
Length` header — 4 bytes/element instead of ~10-20 bytes of JSON text, which
is the difference between a usable and an unusable image-serving client. A
server without the extension gets an automatic one-time fallback to plain
JSON tensors.

API mirrors the reference: construct from `<scheme>://<host>/<endpoint>`,
call with positional numpy arrays (auto-cast to the declared input dtypes),
get back a list of numpy outputs in alphabetical output-name order.
Float outputs are unified to the caller's (float) input dtype, the
reference's contract; integer/bool outputs keep the server-declared dtype —
e.g. a valid-count vector must stay usable as a slice index. gRPC scheme is
not supported (HTTP covers the serving parity claim; Triton serves both
protocols from one server).
"""

from __future__ import annotations

import ast
import json
import urllib.error
import urllib.request
from typing import List
from urllib.parse import urlsplit

import numpy as np

# KServe v2 datatype <-> numpy (Triton config TYPE_* names map to these).
_DT2NP = {"FP64": np.float64, "FP32": np.float32, "FP16": np.float16,
          "INT64": np.int64, "INT32": np.int32, "INT16": np.int16,
          "INT8": np.int8, "UINT8": np.uint8, "UINT16": np.uint16,
          "UINT32": np.uint32, "UINT64": np.uint64, "BOOL": np.bool_}
_NP2DT = {np.dtype(v).name: k for k, v in _DT2NP.items()}


class TritonRemoteModel:
    """Minimal KServe-v2 HTTP client with the reference's call surface."""

    def __init__(self, url: str, endpoint: str = "", scheme: str = "",
                 timeout: float = 30.0, binary: bool = True):
        if not endpoint and not scheme:
            splits = urlsplit(url)
            endpoint = splits.path.strip("/").split("/")[0]
            scheme = splits.scheme or "http"
            url = splits.netloc
        if scheme == "grpc":
            raise NotImplementedError(
                "gRPC scheme not supported; use the HTTP endpoint "
                "(Triton serves both protocols)")
        self.endpoint = endpoint
        self.url = url
        self.scheme = scheme or "http"
        self.timeout = timeout
        self.binary = binary
        self._base = f"{self.scheme}://{self.url}/v2/models/{self.endpoint}"

        meta = self._get_json(self._base)
        inputs = meta.get("inputs", [])
        outputs = sorted(meta.get("outputs", []), key=lambda x: x.get("name"))
        self.input_names = [x["name"] for x in inputs]
        self.input_formats = [x["datatype"] for x in inputs]
        self.np_input_formats = [_DT2NP[f] for f in self.input_formats]
        self.output_names = [x["name"] for x in outputs]
        # Optional user metadata parameter (reference stores an eval'd dict).
        self.metadata = None
        try:
            config = self._get_json(f"{self._base}/config")
            blob = (config.get("parameters", {}).get("metadata", {})
                    .get("string_value"))
            if blob:
                self.metadata = ast.literal_eval(blob)
        except Exception:
            pass  # /config is Triton-specific; plain KServe servers lack it

    # -- http -----------------------------------------------------------------
    def _get_json(self, url: str) -> dict:
        with urllib.request.urlopen(url, timeout=self.timeout) as r:
            return json.loads(r.read().decode())

    def _post(self, url: str, body: bytes, headers: dict) -> tuple[dict, bytes]:
        """POST; returns (response JSON header, trailing binary bytes)."""
        req = urllib.request.Request(url, data=body, headers=headers)
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            raw = r.read()
            hlen = r.headers.get("Inference-Header-Content-Length")
            if hlen is not None:
                hlen = int(hlen)
                return json.loads(raw[:hlen].decode()), raw[hlen:]
            return json.loads(raw.decode()), b""

    # -- inference --------------------------------------------------------------
    def _infer_binary(self, arrays: list[np.ndarray]) -> tuple[dict, bytes]:
        header = {
            "inputs": [
                {"name": self.input_names[i], "shape": list(x.shape),
                 "datatype": self.input_formats[i],
                 "parameters": {"binary_data_size": x.nbytes}}
                for i, x in enumerate(arrays)],
            "outputs": [{"name": n, "parameters": {"binary_data": True}}
                        for n in self.output_names],
        }
        hjson = json.dumps(header).encode()
        body = hjson + b"".join(
            np.ascontiguousarray(x).tobytes() for x in arrays)
        return self._post(f"{self._base}/infer", body, {
            "Content-Type": "application/octet-stream",
            "Inference-Header-Content-Length": str(len(hjson)),
        })

    def _infer_json(self, arrays: list[np.ndarray]) -> tuple[dict, bytes]:
        payload = {
            "inputs": [
                {"name": self.input_names[i], "shape": list(x.shape),
                 "datatype": self.input_formats[i], "data": x.ravel().tolist()}
                for i, x in enumerate(arrays)],
            "outputs": [{"name": n} for n in self.output_names],
        }
        return self._post(f"{self._base}/infer", json.dumps(payload).encode(),
                          {"Content-Type": "application/json"})

    def __call__(self, *inputs: np.ndarray) -> List[np.ndarray]:
        """Run inference; returns outputs in output-name order. Float outputs
        unify to the first input's dtype when it is a float (reference
        contract); integer/bool outputs keep the server dtype."""
        caller_dtype = np.dtype(inputs[0].dtype)
        arrays = []
        for i, x in enumerate(inputs):
            want = self.np_input_formats[i]
            arrays.append(np.asarray(x, dtype=want) if x.dtype != want else
                          np.asarray(x))
        if self.binary:
            try:
                resp, blob = self._infer_binary(arrays)
            except urllib.error.HTTPError:
                # Server lacks the binary extension — fall back permanently.
                self.binary = False
                resp, blob = self._infer_json(arrays)
        else:
            resp, blob = self._infer_json(arrays)

        # Binary output blobs follow the response JSON in the order the
        # outputs appear in it (KServe v2 binary data extension).
        decoded, off = {}, 0
        for o in resp.get("outputs", []):
            dt = np.dtype(_DT2NP[o["datatype"]])
            size = (o.get("parameters") or {}).get("binary_data_size")
            if size is not None:
                arr = np.frombuffer(blob[off:off + size], dtype=dt)
                off += size
            else:
                arr = np.asarray(o["data"], dtype=dt)
            decoded[o["name"]] = arr.reshape(o["shape"])

        outs = []
        for name in self.output_names:
            arr = decoded[name]
            if arr.dtype.kind == "f" and caller_dtype.kind == "f" and \
                    arr.dtype != caller_dtype:
                arr = arr.astype(caller_dtype)
            outs.append(arr)
        return outs
