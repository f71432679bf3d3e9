"""HUB client stubs.

The reference vendors an Ultralytics-HUB client (hub/session.py, auth.py,
utils.py — telemetry, remote training sessions). That service is external
SaaS and out of scope for a TPU deployment (SURVEY.md explicit non-goal);
these stubs keep the import surface so code referencing hub.* ports cleanly.
"""

from yolo_sod_tpu.utils import LOGGER


def login(api_key: str | None = None):
    LOGGER.warning("hub: remote HUB services are not available in this build")
    return False


def logout():
    return None


class HUBTrainingSession:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("HUB training sessions are not supported; "
                                  "use yolo_sod_tpu.engine.trainer directly")
