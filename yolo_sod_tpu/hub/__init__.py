"""HUB layer: self-hostable training-run collector client.

TPU-native re-design of the reference hub package (hub/session.py,
hub/auth.py, hub/utils.py). The reference client is bound to the
Ultralytics SaaS; this one targets any self-hosted collector speaking the
small JSON protocol in `client.py`, configured via the
`YOLO_SOD_HUB_ROOT` env var or an explicit `endpoint=`. With no endpoint
configured (the default in this zero-egress build) every entry point is a
clean no-op / clear error, and telemetry is hard-off unless
`SETTINGS["sync"]` is additionally true.
"""

from yolo_sod_tpu.hub.client import (Events, HUBError, HUBTrainingSession,
                                     events, smart_request)
from yolo_sod_tpu.utils import LOGGER, SETTINGS

__all__ = ["Events", "HUBError", "HUBTrainingSession", "events",
           "smart_request", "login", "logout"]


def login(api_key: str | None = None) -> bool:
    """Store an API key for the configured collector (reference hub.login).

    Returns True when both a key and an endpoint are available.
    """
    from yolo_sod_tpu.hub.client import HUB_ROOT

    if api_key:
        SETTINGS["api_key"] = api_key
    if not HUB_ROOT:
        LOGGER.warning("hub: no collector configured (set YOLO_SOD_HUB_ROOT); "
                       "remote HUB services are opt-in in this build")
        return False
    return bool(SETTINGS.get("api_key"))


def logout() -> None:
    """Forget the stored API key (reference hub.logout)."""
    SETTINGS["api_key"] = ""
