"""Native host collate kernels: bit-exact parity vs the numpy fallbacks.

The C++ kernels (yolo_sod_tpu/native/collate.cc, ctypes-bound) replace the
input pipeline's hottest host ops; every one must be byte-identical to the
numpy path it replaces, on aligned and unaligned shapes. Skips cleanly when
no toolchain is available (native.load() returns None and the wrappers fall
back to numpy, which is then trivially self-consistent)."""

import numpy as np
import pytest

from yolo_sod_tpu import native

rng = np.random.default_rng(7)


def _imgs(b, h, w):
    return [rng.integers(0, 256, (h, w, 3)).astype(np.uint8) for _ in range(b)]


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("no C++ toolchain; numpy fallbacks in use")
    return lib


@pytest.mark.parametrize("h,w", [(640, 640), (63, 17), (1, 1), (480, 641)])
def test_stack_bgr2rgb_parity(lib, h, w):
    items = _imgs(5, h, w)
    ref = np.ascontiguousarray(np.stack(items)[..., ::-1])
    assert np.array_equal(native.stack_bgr2rgb(items), ref)


def test_stack_bgr2rgb_fallback_on_ragged(lib):
    items = [_imgs(1, 32, 32)[0], _imgs(1, 32, 32)[0][:, :, ::-1]]  # non-contig
    ref = np.ascontiguousarray(np.stack(items)[..., ::-1])
    assert np.array_equal(native.stack_bgr2rgb(items), ref)


def test_stack_u8_parity(lib):
    items = _imgs(7, 64, 48)
    assert np.array_equal(native.stack_u8(items), np.stack(items))


@pytest.mark.parametrize("y,x", [(10, 20), (-30, 100), (100, -5), (120, 120),
                                 (-200, -200), (128, 0)])
def test_paste_clipping_parity(lib, y, x):
    tile = _imgs(1, 60, 40)[0]
    a = np.zeros((128, 128, 3), np.uint8)
    b = a.copy()
    native.paste_u8(a, tile, y, x)
    y0, x0 = max(y, 0), max(x, 0)
    y1, x1 = min(y + 60, 128), min(x + 40, 128)
    if y1 > y0 and x1 > x0:
        b[y0:y1, x0:x1] = tile[y0 - y:y1 - y, x0 - x:x1 - x]
    assert np.array_equal(a, b)


def test_fill_parity(lib):
    a = np.zeros((40, 40, 3), np.uint8)
    native.fill_u8(a, (114, 30, 200))
    assert np.array_equal(a, np.broadcast_to(np.array([114, 30, 200], np.uint8),
                                             (40, 40, 3)))
    native.fill_u8(a, (114, 114, 114))  # memset path
    assert (a == 114).all()


def test_collate_uses_native_and_matches(lib, tmp_path):
    """The loader's collate output is identical with and without native."""
    import os
    from yolo_sod_tpu.data.build import collate

    items = [{"img": im, "labels": np.zeros((0, 5), np.float32),
              "im_file": "x", "ori_shape": (64, 64), "ratio_pad": ((1, 1), (0, 0))}
             for im in _imgs(3, 64, 64)]
    got = collate(items, max_boxes=8)
    ref_img = np.ascontiguousarray(np.stack([it["img"] for it in items])[..., ::-1])
    assert np.array_equal(got["img"], ref_img)
