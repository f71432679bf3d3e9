"""Remote Triton Inference Server client (KServe Predict-Protocol v2).

Analog of reference utils/triton.py:9 (TritonRemoteModel, 93 LoC). The
reference wraps the `tritonclient` package; that dependency is not in this
image, and the HTTP flavor of the protocol is a small, stable JSON+binary
REST surface — so this client speaks KServe v2 directly over stdlib
`urllib`, which also makes it testable against an in-process stub server
(tests/test_triton_client.py). Endpoints used:

    GET  /v2/models/<name>                  — model metadata (inputs/outputs)
    GET  /v2/models/<name>/config           — Triton config (metadata params)
    POST /v2/models/<name>/infer            — inference, JSON tensors

API mirrors the reference: construct from `<scheme>://<host>/<endpoint>`,
call with positional numpy arrays (auto-cast to the declared input dtypes),
get back a list of numpy outputs in alphabetical output-name order, cast to
the caller's input dtype. gRPC scheme is not supported (HTTP covers the
serving parity claim; Triton serves both from one server).
"""

from __future__ import annotations

import ast
import json
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
                 timeout: float = 30.0):
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

    def _post_json(self, url: str, payload: dict) -> dict:
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read().decode())

    # -- inference --------------------------------------------------------------
    def __call__(self, *inputs: np.ndarray) -> List[np.ndarray]:
        """Run inference; returns outputs in output-name order, cast to the
        first input's dtype (reference contract)."""
        caller_dtype = inputs[0].dtype
        tensors = []
        for i, x in enumerate(inputs):
            want = self.np_input_formats[i]
            if x.dtype != want:
                x = x.astype(want)
            tensors.append({
                "name": self.input_names[i],
                "shape": list(x.shape),
                "datatype": self.input_formats[i],
                "data": x.ravel().tolist(),
            })
        payload = {
            "inputs": tensors,
            "outputs": [{"name": n} for n in self.output_names],
        }
        resp = self._post_json(f"{self._base}/infer", payload)
        by_name = {o["name"]: o for o in resp.get("outputs", [])}
        outs = []
        for name in self.output_names:
            o = by_name[name]
            arr = np.asarray(o["data"], dtype=_DT2NP[o["datatype"]])
            outs.append(arr.reshape(o["shape"]).astype(caller_dtype))
        return outs
