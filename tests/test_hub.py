"""HUB client tests against an in-process HTTP collector.

Covers the protocol in yolo_sod_tpu/hub/client.py: model create, queued
metrics upload, raw msgpack checkpoint upload, heartbeat, smart_request
retry-on-5xx, and the offline no-op gates (parity doctrine: reference
hub/session.py upload_metrics/upload_model behavior, minus the SaaS).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest


class Collector(BaseHTTPRequestHandler):
    store = None  # set per-test

    def log_message(self, *a):
        pass

    def do_POST(self):
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        st = type(self).store
        st["requests"].append((self.path, dict(self.headers), body))
        if self.path == "/v1/models":
            st["n_create"] += 1
            if st["fail_first_n"] > 0:
                st["fail_first_n"] -= 1
                self.send_response(503)
                self.end_headers()
                return
            out = json.dumps({"id": "m1"}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)
            return
        self.send_response(200)
        self.send_header("Content-Length", "2")
        self.end_headers()
        self.wfile.write(b"{}")

    def do_GET(self):
        self.do_POST()


@pytest.fixture()
def collector():
    store = {"requests": [], "fail_first_n": 0, "n_create": 0}
    Collector.store = store
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Collector)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", store
    srv.shutdown()


def _wait(pred, timeout=5.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.05)
    return False


def test_session_protocol(collector, tmp_path):
    from yolo_sod_tpu.hub import HUBTrainingSession

    url, store = collector
    s = HUBTrainingSession(endpoint=url, api_key="k123",
                           model_args={"model": "yolov12n.yaml"},
                           heartbeat_interval=0.1)
    assert s.model_id == "m1"
    # create carried the api key header
    path, headers, body = store["requests"][0]
    assert path == "/v1/models" and headers.get("X-Api-Key") == "k123"
    assert json.loads(body)["args"]["model"] == "yolov12n.yaml"

    # heartbeat arrives without blocking the caller
    assert _wait(lambda: any("/heartbeat" in p for p, _, _ in store["requests"]))

    # metrics queue accumulates across epochs and re-sends the whole queue.
    # Uploads are off-thread and the ThreadingHTTPServer records arrivals in
    # completion order, so don't assume the LAST body is the cumulative one —
    # just require that SOME upload carried the full queue.
    s.upload_metrics(metrics={0: {"mAP50": 0.1}})
    s.upload_metrics(metrics={1: {"mAP50": 0.2}})

    def _metric_key_sets():
        return [set(json.loads(b)["metrics"])
                for p, _, b in store["requests"] if "/metrics" in p]

    assert _wait(lambda: any(q in ({"0", "1"}, {0, 1})
                             for q in _metric_key_sets()))

    # checkpoint upload: raw bytes + epoch headers
    ckpt = tmp_path / "best.ckpt"
    ckpt.write_bytes(b"\x81\xa4test\xc3")  # arbitrary msgpack-ish blob
    s.upload_model(ckpt_path=str(ckpt), epoch=7, is_best=True, map_=0.5)
    assert _wait(lambda: any("/checkpoints" in p for p, _, _ in store["requests"]))
    p, h, b = [r for r in store["requests"] if "/checkpoints" in r[0]][-1]
    assert b == ckpt.read_bytes()
    assert h.get("X-Epoch") == "7" and h.get("X-Is-Best") == "1"
    s.close()


def test_smart_request_retries_on_5xx(collector):
    from yolo_sod_tpu.hub import HUBTrainingSession

    url, store = collector
    store["fail_first_n"] = 2   # two 503s, then 200
    s = HUBTrainingSession(endpoint=url, heartbeat_interval=999)
    assert s.model_id == "m1"
    assert store["n_create"] == 3
    s.close()


def test_offline_gates(monkeypatch):
    import yolo_sod_tpu.hub as hub
    import yolo_sod_tpu.hub.client as client

    monkeypatch.setattr(client, "HUB_ROOT", "")
    with pytest.raises(hub.HUBError):
        hub.HUBTrainingSession()
    assert hub.login() is False
    ev = hub.Events(endpoint="")
    ev("train_start")            # silently dropped
    assert ev.queue == [] and not ev.enabled


def test_trainer_attach_smoke(collector):
    """attach() registers real callbacks on a trainer-shaped object."""
    from yolo_sod_tpu.hub import HUBTrainingSession

    url, store = collector

    class FakeTrainer:
        def __init__(self):
            self.callbacks = {}
            self.epoch = 3
            self.metrics = None
            self.best = None
            self.last = None

        def add_callback(self, event, cb):
            self.callbacks.setdefault(event, []).append(cb)

    t = FakeTrainer()
    s = HUBTrainingSession(endpoint=url, heartbeat_interval=999)
    s.attach(t)
    assert set(t.callbacks) == {"on_fit_epoch_end", "on_model_save", "teardown"}
    for cb in t.callbacks["on_fit_epoch_end"]:
        cb(t)
    assert _wait(lambda: any("/metrics" in p for p, _, _ in store["requests"]))
    for cb in t.callbacks["teardown"]:
        cb(t)
    assert s.alive is False


def test_smart_request_retries_after_transient_failure():
    """A refused connection (fast URLError) must be retried up to `retry`
    times within the total budget — regression: the old code compared
    elapsed against the PER-REQUEST timeout, so any timeout-class failure
    killed the loop on attempt 0 (VERDICT-class retry-dead bug)."""
    import threading
    import time
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from yolo_sod_tpu.hub.client import smart_request

    hits = []

    class Flaky(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            hits.append(time.time())
            if len(hits) < 3:                    # two 500s, then success
                self.send_response(500)
                self.end_headers()
                return
            body = b'{"ok": true}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = HTTPServer(("127.0.0.1", 0), Flaky)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        code, payload = smart_request(
            "POST", f"http://127.0.0.1:{srv.server_port}/x", data=b"{}",
            retry=3, timeout=30.0, verbose=False)
        assert code == 200 and payload == {"ok": True}
        assert len(hits) == 3
    finally:
        srv.shutdown()
