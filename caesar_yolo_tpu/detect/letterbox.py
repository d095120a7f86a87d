"""Letterbox resize + inverse box mapping (fixed-shape, jit-able).

The reference delegates letterboxing to ultralytics inside `model()`
(reference evaluation.py:181-193).  Semantics re-derived from the
published behavior: aspect-preserving resize with scale
r = min(S/h, S/w) (upscaling allowed), centered padding with gray
(114/255), and `scale_boxes`-style inverse mapping with the same
round(d +- 0.1) pad split.

All geometry is computed from STATIC shapes at trace time, so the padded
output has a fixed [S, S, C] shape and the whole thing fuses into the
surrounding jit program.

Known divergence from ultralytics, documented for parity work: for .pt
models on NON-square inputs ultralytics letterboxes to the minimum
stride-32 rectangle (auto=True), not to the full SxS square.  The
network is fully convolutional, so boxes only shift near the extra pad
border.  A fixed-shape TPU program pads to the square (one compiled
program per input shape); radio cutouts and mosaic tiles are square, so
the golden parity harness exercises exactly that case.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PAD_VALUE = 114.0 / 255.0


def letterbox_geometry(h: int, w: int, img_size: int):
    """Static letterbox geometry: (scale, new_h, new_w, top, left)."""
    r = min(img_size / h, img_size / w)
    new_h, new_w = round(h * r), round(w * r)
    dh = (img_size - new_h) / 2
    dw = (img_size - new_w) / 2
    top = round(dh - 0.1)
    left = round(dw - 0.1)
    return r, new_h, new_w, top, left


def letterbox(image: jnp.ndarray, img_size: int,
              pad_value: float = PAD_VALUE) -> jnp.ndarray:
    """[H, W, C] -> [S, S, C] aspect-preserving resize + centered pad."""
    h, w, c = image.shape
    r, new_h, new_w, top, left = letterbox_geometry(h, w, img_size)
    out = image
    if (new_h, new_w) != (h, w):
        # antialias=False: plain bilinear, matching the published pipeline's
        # cv2.INTER_LINEAR / torch bilinear semantics on downscale too
        out = jax.image.resize(out.astype(jnp.float32), (new_h, new_w, c),
                               method="linear", antialias=False)
    return jnp.pad(out, ((top, img_size - new_h - top),
                         (left, img_size - new_w - left), (0, 0)),
                   constant_values=pad_value)


def letterbox_batch(images: jnp.ndarray, img_size: int,
                    pad_value: float = PAD_VALUE) -> jnp.ndarray:
    """[B, H, W, C] -> [B, S, S, C] (same geometry for the whole batch)."""
    return jax.vmap(lambda im: letterbox(im, img_size, pad_value))(images)


def unletterbox_boxes(boxes: jnp.ndarray, h: int, w: int,
                      img_size: int) -> jnp.ndarray:
    """Map xyxy boxes from letterboxed [S, S] coords back to the original
    [h, w] image, clipping to image bounds (scale_boxes semantics)."""
    r, _, _, top, left = letterbox_geometry(h, w, img_size)
    shift = jnp.asarray([left, top, left, top], dtype=boxes.dtype)
    out = (boxes - shift) / r
    lim = jnp.asarray([w, h, w, h], dtype=boxes.dtype)
    return jnp.clip(out, 0.0, lim)
