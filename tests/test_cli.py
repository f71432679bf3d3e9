"""CLI entrypoint tests (reference test_cli.py doctrine, in-process)."""

import numpy as np
import pytest


def test_entrypoint_help_and_version(capsys):
    from yolo_sod_tpu.cfg import entrypoint

    entrypoint("yolo-sod")            # usage
    entrypoint("yolo-sod version")    # version


def test_entrypoint_rejects_bad_args():
    from yolo_sod_tpu.cfg import entrypoint

    with pytest.raises(SyntaxError):
        entrypoint("yolo-sod notathing")
    with pytest.raises(ValueError):
        entrypoint("yolo-sod mode=fly")


def test_entrypoint_predict(tmp_path):
    import cv2

    from yolo_sod_tpu.cfg import entrypoint

    img = (np.random.rand(64, 64, 3) * 255).astype(np.uint8)
    src = tmp_path / "img.jpg"
    cv2.imwrite(str(src), img)
    results = entrypoint(f"yolo-sod detect predict model=yolov12n.yaml "
                         f"source={src} imgsz=64 conf=0.01 verbose=False")
    assert len(results) == 1
