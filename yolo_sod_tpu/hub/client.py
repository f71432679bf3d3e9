"""Self-hostable HUB client: retrying HTTP, telemetry, training sessions.

TPU-native re-design of the reference's HUB layer (reference
hub/session.py:19 HUBTrainingSession, hub/utils.py:111 smart_request,
hub/utils.py:170 Events). The reference client is hard-wired to the
Ultralytics SaaS; this one speaks a small JSON protocol against ANY
endpoint (`YOLO_SOD_HUB_ROOT` env or explicit `endpoint=`), so a training
fleet can report to a self-hosted collector. Everything degrades to a
clean no-op when no endpoint is configured — the default in this
zero-egress build.

Protocol (all JSON over POST unless noted):
    POST {root}/v1/models                      -> {"id": ...}   create model
    GET  {root}/v1/models/{id}                 -> model record
    POST {root}/v1/models/{id}/metrics         body {"metrics": {epoch: json}}
    POST {root}/v1/models/{id}/checkpoints     raw msgpack body,
         headers X-Epoch / X-Is-Best / X-Map
    POST {root}/v1/events                      body {"events": [...]}
    POST {root}/v1/models/{id}/heartbeat       body {"agent": ...}
"""

from __future__ import annotations

import json
import os
import random
import threading
import time
import urllib.error
import urllib.request
from pathlib import Path
from typing import Optional

from yolo_sod_tpu.utils import LOGGER, SETTINGS, colorstr

HUB_ROOT = os.environ.get("YOLO_SOD_HUB_ROOT", "")
PREFIX = colorstr("hub:")
RETRY_CODES = (408, 429, 500, 502, 503, 504)


class HUBError(Exception):
    """Raised when the HUB endpoint rejects a request unrecoverably."""


def smart_request(method: str, url: str, data: Optional[bytes] = None,
                  headers: Optional[dict] = None, retry: int = 3,
                  timeout: float = 30.0, thread: bool = False,
                  verbose: bool = True):
    """HTTP with exponential backoff on transient codes (reference
    hub/utils.py:111 smart_request).

    stdlib urllib, not requests: the runtime keeps zero hard deps. With
    `thread=True` the request runs fire-and-forget in a daemon thread and
    returns None (telemetry/metrics must never block a train step).
    Returns (status_code, parsed_json_or_None) otherwise.
    """
    headers = {"Content-Type": "application/json", **(headers or {})}

    def _do():
        # `timeout` is the TOTAL budget for the retry loop (reference
        # semantics); each request gets the remaining slice of it, so a
        # request that blocks its full slice still leaves the earlier,
        # faster-failing attempts their backoff retries.
        t0 = time.time()
        for attempt in range(retry + 1):
            remaining = timeout - (time.time() - t0)
            if remaining <= 0:
                break
            try:
                req = urllib.request.Request(url, data=data, headers=headers,
                                             method=method)
                with urllib.request.urlopen(req, timeout=remaining) as r:
                    body = r.read()
                    try:
                        return r.status, json.loads(body) if body else None
                    except json.JSONDecodeError:
                        return r.status, None
            except urllib.error.HTTPError as e:
                if e.code not in RETRY_CODES or attempt == retry:
                    if verbose:
                        LOGGER.warning(f"{PREFIX} {method} {url} -> {e.code}")
                    return e.code, None
            except (urllib.error.URLError, TimeoutError, OSError) as e:
                if attempt == retry or time.time() - t0 >= timeout:
                    if verbose:
                        try:
                            LOGGER.warning(f"{PREFIX} {method} {url} failed: {e}")
                        except ValueError:
                            pass  # stream closed at interpreter teardown (daemon thread)
                    return None, None
            time.sleep(max(0.0, min(2 ** attempt + random.random(), 8.0,
                                    timeout - (time.time() - t0))))
        if verbose:
            try:
                LOGGER.warning(f"{PREFIX} {method} {url}: budget exhausted")
            except ValueError:
                pass
        return None, None

    if thread:
        threading.Thread(target=_do, daemon=True).start()
        return None
    return _do()


class Events:
    """Rate-limited anonymous usage telemetry (reference hub/utils.py:170).

    Enabled only when BOTH a HUB endpoint is configured and
    SETTINGS["sync"] is true — i.e. hard-off in this build unless the
    deployer opts in. Events accumulate in a bounded queue and flush at
    most once per `rate_limit` seconds, off-thread.
    """

    def __init__(self, endpoint: str = "", rate_limit: float = 30.0):
        self.endpoint = endpoint or HUB_ROOT
        self.rate_limit = rate_limit
        self.queue: list[dict] = []
        self.t_last = 0.0
        self.enabled = bool(self.endpoint) and bool(SETTINGS.get("sync", False))

    def __call__(self, event: str, **params):
        if not self.enabled:
            return
        if len(self.queue) < 25:
            self.queue.append({"name": event, "ts": time.time(), **params})
        if time.time() - self.t_last < self.rate_limit:
            return
        payload = json.dumps({"events": self.queue}).encode()
        self.queue, self.t_last = [], time.time()
        smart_request("POST", f"{self.endpoint}/v1/events", data=payload,
                      thread=True, verbose=False)


events = Events()


class HUBTrainingSession:
    """Report a training run to a HUB collector via trainer callbacks
    (reference hub/session.py:19).

    Wire-up: `session.attach(trainer)` registers `on_fit_epoch_end`
    (queued-metrics upload, reference :311 upload_metrics) and
    `on_model_save` (msgpack checkpoint upload, reference :315
    upload_model). A daemon heartbeat announces liveness every
    `heartbeat_interval` seconds. All uploads are off-thread and
    best-effort — the train loop never blocks on the collector.
    """

    def __init__(self, model_id: Optional[str] = None,
                 endpoint: Optional[str] = None,
                 api_key: Optional[str] = None,
                 model_args: Optional[dict] = None,
                 heartbeat_interval: float = 300.0):
        self.endpoint = (endpoint or HUB_ROOT).rstrip("/")
        if not self.endpoint:
            raise HUBError(
                "no HUB endpoint configured: set YOLO_SOD_HUB_ROOT or pass "
                "endpoint= (remote HUB services are opt-in in this build)")
        self.api_key = api_key or SETTINGS.get("api_key", "")
        self.metrics_queue: dict[int, str] = {}
        self.alive = True
        if model_id is None:
            code, body = self._request("POST", "/v1/models",
                                       {"args": model_args or {}})
            if code != 200 or not body or "id" not in body:
                raise HUBError(f"model create failed (status {code})")
            model_id = str(body["id"])
        self.model_id = model_id
        self.model_url = f"{self.endpoint}/v1/models/{self.model_id}"
        self._stop = threading.Event()
        self._hb = threading.Thread(target=self._heartbeat_loop,
                                    args=(heartbeat_interval,), daemon=True)
        self._hb.start()
        LOGGER.info(f"{PREFIX} session live at {self.model_url}")

    # -- plumbing -----------------------------------------------------------
    def _headers(self, extra: Optional[dict] = None) -> dict:
        h = {"X-Api-Key": self.api_key} if self.api_key else {}
        return {**h, **(extra or {})}

    def _request(self, method: str, path: str, payload=None, thread=False,
                 raw: Optional[bytes] = None, extra_headers=None, **kw):
        data = raw if raw is not None else (
            json.dumps(payload).encode() if payload is not None else None)
        headers = self._headers(extra_headers)
        if raw is not None:
            headers["Content-Type"] = "application/octet-stream"
        return smart_request(method, f"{self.endpoint}{path}", data=data,
                             headers=headers, thread=thread, **kw)

    def _heartbeat_loop(self, interval: float):
        # Liveness pings never retry and never log: a missed beat is normal
        # (the collector marks the model stale), and a retrying daemon
        # thread can outlive the interpreter and spray logging errors at
        # teardown. The Event lets close() stop the loop immediately.
        while self.alive:
            self._request("POST", f"/v1/models/{self.model_id}/heartbeat",
                          {"agent": "yolo-sod-tpu"}, thread=True,
                          retry=0, verbose=False)
            if self._stop.wait(interval):
                return

    # -- trainer hooks ------------------------------------------------------
    def attach(self, trainer):
        """Register upload callbacks on a DetectionTrainer-family object."""
        trainer.add_callback("on_fit_epoch_end",
                             lambda t: self.upload_metrics(t))
        trainer.add_callback("on_model_save",
                             lambda t: self.upload_model(t))
        trainer.add_callback("teardown", lambda t: self.close())

    def upload_metrics(self, trainer=None, metrics: Optional[dict] = None):
        """Queue this epoch's metrics and POST the whole queue (the queue
        self-heals missed epochs when the collector was unreachable)."""
        if trainer is not None:
            epoch = int(getattr(trainer, "epoch", len(self.metrics_queue)))
            m = getattr(trainer, "metrics", None)
            row = {}
            if m is not None and hasattr(m, "mean_results"):
                mp, mr, map50, map5095 = m.mean_results()
                row = {"precision": float(mp), "recall": float(mr),
                       "mAP50": float(map50), "mAP50-95": float(map5095)}
            self.metrics_queue[epoch] = json.dumps(row)
        elif metrics is not None:
            self.metrics_queue.update(
                {int(k): json.dumps(v) for k, v in metrics.items()})
        self._request("POST", f"/v1/models/{self.model_id}/metrics",
                      {"metrics": self.metrics_queue}, thread=True)

    def upload_model(self, trainer=None, ckpt_path: Optional[str] = None,
                     epoch: int = 0, is_best: bool = False, map_: float = 0.0):
        """Upload a msgpack checkpoint (reference :315 upload_model — but
        the artifact is our pickle-free msgpack pytree, not torch.save)."""
        if trainer is not None:
            best = getattr(trainer, "best", None)
            last = getattr(trainer, "last", None)
            path = best if (best and Path(best).exists()) else last
            if not path or not Path(path).exists():
                return
            ckpt_path = str(path)
            epoch = int(getattr(trainer, "epoch", 0))
            is_best = bool(best and Path(best) == Path(ckpt_path))
        if not ckpt_path or not Path(ckpt_path).exists():
            return
        blob = Path(ckpt_path).read_bytes()
        self._request(
            "POST", f"/v1/models/{self.model_id}/checkpoints", raw=blob,
            thread=True,
            extra_headers={"X-Epoch": str(epoch),
                           "X-Is-Best": str(int(is_best)),
                           "X-Map": f"{map_:.5f}"})

    def close(self, *_):
        self.alive = False
        self._stop.set()
