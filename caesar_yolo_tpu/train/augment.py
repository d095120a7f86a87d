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

from caesar_yolo_tpu.detect.letterbox import PAD_VALUE as _PAD
# out-of-frame fill matches the letterbox gray (ultralytics
# random_perspective borderValue=114): black corners would diverge the
# train-time distribution from serving AND read as "masked" under the
# pipeline's pixel==0 convention


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
    # image resampling works in pixel-INDEX space (centers at integer
    # indices -> rotation center (w-1)/2); boxes are EDGE coordinates in
    # [0, w] (edge = index + 0.5), so the same physical rotation acts
    # about w/2 there — using the index center for boxes displaces
    # every label by 1px under a 180-degree draw
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    _, inv = _rot_scale_mats(angle, s, cx, cy)
    fwd_box, _ = _rot_scale_mats(angle, s, w / 2.0, h / 2.0)

    img = _affine_sample(image, inv, pad_val=_PAD)
    new_boxes = _transform_boxes(boxes, fwd_box)
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


# ---------------------------------------------------------------------------
# Fast batched resampler (TPU): rot90 + shear/scale decomposition
# ---------------------------------------------------------------------------
#
# The single-pass bilinear _affine_sample is a 4-neighbor arbitrary
# gather — measured 269 ms for a [16, 640, 640, 3] batch on v5e (the
# train step itself is ~30 ms: augmentation would dominate training
# 9:1).  The decomposition below runs the same rotation+scale as
#   exact rot90^q  ∘  x-shear  ∘  separable scale  ∘  y-shear
# with |residual angle| <= 45 deg: shears are per-row constant
# fractional shifts (VMEM lane rolls, ops/pallas_shift.py), scales are
# [S, S] interpolation-matrix einsums on the MXU.  90-degree multiples
# and the identity are bit-exact; arbitrary angles agree with the
# one-pass sampler to ~1% of the value range (interpolation-scheme
# difference, validated in tests/test_augment_fast.py).  Box math is
# shared and exact.


def _row_shift_batch(imgs, shifts, pad, pad_val):
    """[B, H, W, C] rows shifted by [B, H] fractional amounts: Pallas
    lane-roll kernel on TPU, the equivalent dynamic-slice formulation
    elsewhere (identical results)."""
    # 'axon' is this repo's TPU backend name on the tunneled chip (same
    # gate as ops/pallas_upsample.py, models/pallas_attn.py)
    if jax.default_backend() in ("tpu", "axon"):
        from caesar_yolo_tpu.ops.pallas_shift import \
            fractional_row_shift_batch
        return fractional_row_shift_batch(imgs, shifts, pad, pad_val)

    def one(img, sh):
        h, w, c = img.shape
        padded = jnp.pad(img, ((0, 0), (pad, pad), (0, 0)),
                         constant_values=pad_val)
        k0 = jnp.clip(jnp.floor(sh).astype(jnp.int32), -pad, pad - 1)
        f = (sh - jnp.floor(sh))[:, None, None]

        def row(prow, k):
            a = jax.lax.dynamic_slice(prow, (k + pad, 0), (w, c))
            b = jax.lax.dynamic_slice(prow, (k + pad + 1, 0), (w, c))
            return a, b

        a, b = jax.vmap(row)(padded, k0)
        return a * (1 - f) + b * f

    return jax.vmap(one)(imgs, shifts)


def _scale_mats(s, size, center):
    """[B] scales -> [B, size, size] 1-D interp matrices for
    src = s*(x - c) + c (rows: output, cols: source; OOB rows zero)."""
    x = jnp.arange(size, dtype=jnp.float32)
    src = s[:, None] * (x[None] - center) + center          # [B, size]
    i0 = jnp.floor(src).astype(jnp.int32)
    f = src - jnp.floor(src)
    oh0 = jax.nn.one_hot(jnp.clip(i0, 0, size - 1), size)
    oh1 = jax.nn.one_hot(jnp.clip(i0 + 1, 0, size - 1), size)
    in0 = ((i0 >= 0) & (i0 < size)).astype(jnp.float32)[..., None]
    in1 = ((i0 + 1 >= 0) & (i0 + 1 < size)).astype(jnp.float32)[..., None]
    return (1 - f)[..., None] * oh0 * in0 + f[..., None] * oh1 * in1


def _rot_scale_sample_batch(imgs, angles, scales, pad_val=0.0):
    """Batched bilinear resample of square imgs [B, S, S, C] through the
    centered inverse map (1/scale) R(-angle)."""
    bsz, h, w, c = imgs.shape
    cx = (w - 1) / 2.0
    theta = -angles
    sp = 1.0 / scales
    q = jnp.round(theta / (jnp.pi / 2)).astype(jnp.int32)
    r = theta - q.astype(jnp.float32) * (jnp.pi / 2)

    def rot_k(im, k):
        return jax.lax.switch(k % 4,
                              [lambda m: m,
                               lambda m: jnp.rot90(m, 1),
                               lambda m: jnp.rot90(m, 2),
                               lambda m: jnp.rot90(m, 3)],
                              im)

    out = jax.vmap(rot_k)(imgs, q)
    # expanded working canvas: intermediate shear/scale passes need data
    # the final crop maps back inside (at 45 deg the x-shear alone
    # overhangs by ~S/4)
    m = int(0.35 * max(h, w)) + 2
    out = jnp.pad(out, ((0, 0), (m, m), (m, m), (0, 0)),
                  constant_values=pad_val)
    hp = h + 2 * m
    cp = cx + m
    pad = hp // 2 + 2
    cosr = jnp.cos(r)
    u = -jnp.tan(r)
    ll = jnp.tan(r)
    ys = jnp.arange(hp, dtype=jnp.float32) - cp
    # x-shear (src_x = x + u*(y - c))
    out = _row_shift_batch(out, u[:, None] * ys[None], pad, pad_val)
    # separable scales (s1 = sp/cos along x, s2 = sp*cos along y).
    # OOB interp rows have zero weight — top up with pad_val so the
    # fill matches the shear/pad passes (partial coverage blends,
    # exactly the per-tap OOB semantics of _affine_sample)
    Wx = _scale_mats(sp / cosr, hp, cp)
    Wy = _scale_mats(sp * cosr, hp, cp)
    out = (jnp.einsum("box,bhxc->bhoc", Wx, out)
           + (1.0 - Wx.sum(-1))[:, None, :, None] * pad_val)
    out = (jnp.einsum("boy,byxc->boxc", Wy, out)
           + (1.0 - Wy.sum(-1))[:, :, None, None] * pad_val)
    # y-shear (src_y = y + l*(x - c)) on the transposed layout
    out = jnp.swapaxes(out, 1, 2)
    out = _row_shift_batch(out, ll[:, None] * ys[None], pad, pad_val)
    out = jnp.swapaxes(out, 1, 2)
    return out[:, m:m + h, m:m + w]


@partial(jax.jit, static_argnames=("degrees", "scale", "flipud", "fliplr"))
def augment_batch(key, images, boxes, masks, *, degrees: float = 180.0,
                  scale: float = 0.89, flipud: float = 0.5,
                  fliplr: float = 0.5):
    """Batched augmentation: images [B, H, W, C], boxes [B, M, 4],
    masks [B, M] -> same shapes.

    Square images take the fast rot90+shear/scale resampler (see above);
    non-square fall back to the per-sample gather formulation."""
    bsz, h, w, _ = images.shape
    keys = jax.random.split(key, bsz)
    if h != w:
        return jax.vmap(lambda k, i, b, m: augment_sample(
            k, i, b, m, degrees=degrees, scale=scale, flipud=flipud,
            fliplr=fliplr))(keys, images, boxes, masks)

    ks = jax.vmap(lambda k: jax.random.split(k, 4))(keys)
    angles = jax.vmap(lambda k: jax.random.uniform(
        k, (), minval=-degrees, maxval=degrees))(ks[:, 0]) * jnp.pi / 180.0
    ss = jax.vmap(lambda k: jax.random.uniform(
        k, (), minval=1.0 - scale, maxval=1.0 + scale))(ks[:, 1])

    imgs = _rot_scale_sample_batch(images, angles, ss, pad_val=_PAD)
    # boxes transform in EDGE coordinates: center w/2, not the image
    # resampler's index-space (w-1)/2 (see augment_sample)
    fwd = jax.vmap(lambda a, s: _rot_scale_mats(
        a, s, w / 2.0, h / 2.0)[0])(angles, ss)
    new_boxes = jax.vmap(_transform_boxes)(boxes, fwd)
    lim = jnp.asarray([w, h, w, h], dtype=new_boxes.dtype)
    new_boxes = jnp.clip(new_boxes, 0.0, lim)
    masks = masks & jax.vmap(_box_candidates)(boxes, new_boxes)

    do_ud = jax.vmap(lambda k: jax.random.uniform(k) < flipud)(ks[:, 2])
    do_lr = jax.vmap(lambda k: jax.random.uniform(k) < fliplr)(ks[:, 3])
    imgs = jnp.where(do_ud[:, None, None, None], imgs[:, ::-1], imgs)
    imgs = jnp.where(do_lr[:, None, None, None], imgs[:, :, ::-1], imgs)
    x1, y1, x2, y2 = (new_boxes[..., i] for i in range(4))
    ud = do_ud[:, None]
    lr = do_lr[:, None]
    x1f, x2f = jnp.where(lr, w - x2, x1), jnp.where(lr, w - x1, x2)
    y1f, y2f = jnp.where(ud, h - y2, y1), jnp.where(ud, h - y1, y2)
    return imgs, jnp.stack([x1f, y1f, x2f, y2f], axis=-1), masks
