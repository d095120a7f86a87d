"""Training augmentations as batched, jit-able JAX ops.

The reference trains with the ultralytics augmentation config
degrees=180, flipud=0.5, fliplr=0.5, scale=0.89, and everything else
(mosaic/hsv/translate/erasing) disabled (reference
macros/run_train.py:33-44).  This implements exactly that subset —
random rotation + isotropic scale about the image center with bilinear
resampling, then random flips — as a vmapped device computation with
per-sample PRNG keys (no host RNG loop), transforming boxes through the
same affine and filtering degenerate survivors (the published
box_candidates rule: w,h > 2px, area ratio > 0.1, aspect < 100).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _affine_sample(img: jnp.ndarray, mat_inv: jnp.ndarray,
                   pad_val: float = 0.0) -> jnp.ndarray:
    """Bilinear-sample img[H, W, C] through the inverse affine matrix
    (output pixel -> input pixel, 2x3)."""
    h, w, c = img.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    sx = mat_inv[0, 0] * xs + mat_inv[0, 1] * ys + mat_inv[0, 2]
    sy = mat_inv[1, 0] * xs + mat_inv[1, 1] * ys + mat_inv[1, 2]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inb[..., None], v, pad_val)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def _rot_scale_mats(angle_rad, scale, cx, cy):
    """Forward (input->output) and inverse 2x3 affines for rotation+scale
    about (cx, cy)."""
    cos, sin = jnp.cos(angle_rad), jnp.sin(angle_rad)

    def compose(a, b, tx, ty):
        # [[a, -b], [b, a]] rotation-scale, centered
        return jnp.asarray([[a, -b, cx - a * cx + b * cy + tx],
                            [b, a, cy - b * cx - a * cy + ty]])

    fwd = compose(scale * cos, scale * sin, 0.0, 0.0)
    inv_s = 1.0 / scale
    inv = compose(inv_s * cos, -inv_s * sin, 0.0, 0.0)
    return fwd, inv


def _transform_boxes(boxes, mat):
    """Map xyxy boxes through a 2x3 affine via their 4 corners."""
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    xs = jnp.stack([x1, x2, x1, x2], axis=-1)
    ys = jnp.stack([y1, y1, y2, y2], axis=-1)
    tx = mat[0, 0] * xs + mat[0, 1] * ys + mat[0, 2]
    ty = mat[1, 0] * xs + mat[1, 1] * ys + mat[1, 2]
    return jnp.stack([tx.min(-1), ty.min(-1), tx.max(-1), ty.max(-1)],
                     axis=-1)


def _box_candidates(orig, new, wh_thr=2.0, ar_thr=100.0, area_thr=0.1,
                    eps=1e-16):
    w1 = orig[..., 2] - orig[..., 0]
    h1 = orig[..., 3] - orig[..., 1]
    w2 = new[..., 2] - new[..., 0]
    h2 = new[..., 3] - new[..., 1]
    ar = jnp.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return ((w2 > wh_thr) & (h2 > wh_thr)
            & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr))


def augment_sample(key, image, boxes, mask, *, degrees: float = 180.0,
                   scale: float = 0.89, flipud: float = 0.5,
                   fliplr: float = 0.5):
    """Augment one [H, W, C] image + [M, 4] xyxy boxes + [M] mask."""
    h, w, _ = image.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    angle = jax.random.uniform(k1, (), minval=-degrees, maxval=degrees)
    angle = angle * jnp.pi / 180.0
    s = jax.random.uniform(k2, (), minval=1.0 - scale, maxval=1.0 + scale)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    fwd, inv = _rot_scale_mats(angle, s, cx, cy)

    img = _affine_sample(image, inv)
    new_boxes = _transform_boxes(boxes, fwd)
    lim = jnp.asarray([w, h, w, h], dtype=new_boxes.dtype)
    new_boxes = jnp.clip(new_boxes, 0.0, lim)
    mask = mask & _box_candidates(boxes, new_boxes)

    do_ud = jax.random.uniform(k3) < flipud
    do_lr = jax.random.uniform(k4) < fliplr
    img = jnp.where(do_ud, img[::-1], img)
    img = jnp.where(do_lr, img[:, ::-1], img)
    x1, y1, x2, y2 = (new_boxes[..., i] for i in range(4))
    x1f, x2f = jnp.where(do_lr, w - x2, x1), jnp.where(do_lr, w - x1, x2)
    y1f, y2f = jnp.where(do_ud, h - y2, y1), jnp.where(do_ud, h - y1, y2)
    new_boxes = jnp.stack([x1f, y1f, x2f, y2f], axis=-1)
    return img, new_boxes, mask


@partial(jax.jit, static_argnames=("degrees", "scale", "flipud", "fliplr"))
def augment_batch(key, images, boxes, masks, *, degrees: float = 180.0,
                  scale: float = 0.89, flipud: float = 0.5,
                  fliplr: float = 0.5):
    """Batched augmentation: images [B, H, W, C], boxes [B, M, 4],
    masks [B, M] -> same shapes."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda k, i, b, m: augment_sample(
        k, i, b, m, degrees=degrees, scale=scale, flipud=flipud,
        fliplr=fliplr))(keys, images, boxes, masks)
