"""Jittable LetterBox: aspect-preserving resize + gray pad, on device.

TPU-native analog of the reference's host-side cv2 LetterBox (absent
ultralytics.data.augment, contract at engine/predictor.py:145-161): resize the
image so the long side fits `new_shape`, pad the rest with 114, and return the
(gain, pad) needed by scale_boxes. With static input shapes the resize lowers
to one XLA gather/convolution — no host round-trip.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def letterbox_params(shape0: Tuple[int, int], new_shape: Tuple[int, int],
                     scaleup: bool = True, center: bool = True):
    """Host-side: compute (gain, (pad_w, pad_h), (new_h, new_w)) for an input shape."""
    h0, w0 = shape0
    nh, nw = new_shape
    r = min(nh / h0, nw / w0)
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = (round(w0 * r), round(h0 * r))  # (w, h)
    dw, dh = nw - new_unpad[0], nh - new_unpad[1]
    if center:
        dw, dh = dw / 2, dh / 2
    return r, (dw, dh), new_unpad


def letterbox(img, new_shape: Tuple[int, int] = (640, 640), pad_value: int = 114,
              scaleup: bool = True, center: bool = True):
    """Letterbox an image (H, W, 3) or batch (B, H, W, 3), uint8 or float.

    Returns (out (…, nh, nw, 3) float32 in [0, 1], gain, (pad_w, pad_h)).
    The shape math is static — one compiled executable per source shape.
    """
    batched = img.ndim == 4
    if not batched:
        img = img[None]
    b, h0, w0, c = img.shape
    nh, nw = new_shape
    r, (dw, dh), (uw, uh) = letterbox_params((h0, w0), (nh, nw), scaleup, center)

    x = img.astype(jnp.float32)
    if (uh, uw) != (h0, w0):
        x = jax.image.resize(x, (b, uh, uw, c), method="linear")
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
    bottom, right = nh - uh - top, nw - uw - left
    x = jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)),
                constant_values=float(pad_value))
    x = x / 255.0
    if not batched:
        x = x[0]
    return x, r, (dw, dh)
