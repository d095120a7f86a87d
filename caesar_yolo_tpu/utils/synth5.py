"""Five-class synthetic radio-source generation (device-side, jitted).

The reference's headline quality artifact is a per-class F1 table over
the five radio morphologies its models are trained on
(reference README.md:154-161, table :190-207):

  0 spurious             sidelobe / PSF-artifact pattern (ring lobes)
  1 compact              point-like, ~beam-sized elliptical Gaussian
  2 extended             elongated multi-component diffuse emission
  3 extended-multisland  several DISJOINT islands sharing ONE gt box
  4 flagged              bright source contaminated by a linear artifact

The real dataset (Riggi+2023) is not available in this environment, so
this module synthesizes the five morphologies with exactly known ground
truth at the reference's native cutout size (132x132,
reference README.md:163) — the offline analog that lets the framework
train a genuinely multi-class detector and exercise class-aware NMS,
same-class soft-merge (reference inference.py:650-658) and the
real/spurious/flagged counting rules (make_prediction.py:328-547) end
to end.

Rendering runs ON DEVICE inside one jitted program (like
scripts/train_synth_demo.make_tile_fn) so a training loop is never
host-synthesis bound: per tile, up to ``max_src`` sources are placed on
a jittered 2x2 quadrant grid (bounding mutual blending), each slot
draws a class uniformly and renders via masked select over the five
fixed-shape field formulations.  Ground-truth boxes follow the 2-sigma
extent convention of utils/synth.py, computed exactly per morphology
(rotated-ellipse extents; island/stripe unions).
"""

from __future__ import annotations

from functools import partial

import numpy as np

# Reference class ids / names (README.md:154-161).
CLASS_NAMES = ("spurious", "compact", "extended", "extended-multisland",
               "flagged")
NATIVE_SIZE = 132  # the reference dataset's cutout size (README.md:163)


def _ellipse_extents(sa, sb, ct, st):
    """Axis-aligned half extents of the 2-sigma rotated ellipse."""
    import jax.numpy as jnp
    hx = 2.0 * jnp.sqrt((sa * ct) ** 2 + (sb * st) ** 2)
    hy = 2.0 * jnp.sqrt((sa * st) ** 2 + (sb * ct) ** 2)
    return hx, hy


def make_multiclass_tile_fn(size: int = NATIVE_SIZE, max_src: int = 4,
                            noise: float = 0.08):
    """Build a jitted ``make(key, batch) -> (img3, labels, boxes, mask)``.

    img3:   [B, size, size, 3] float32 in [0, 1] (min-max normalized,
            the FITS load convention of train/dataset.load_sample)
    labels: [B, max_src] int32 reference class ids (0..4)
    boxes:  [B, max_src, 4] xyxy in tile pixels
    mask:   [B, max_src] bool
    """
    import jax
    import jax.numpy as jnp

    px = size / float(NATIVE_SIZE)  # morphology params scale with size
    yy, xx = np.mgrid[0:size, 0:size]
    yy = jnp.asarray(yy, jnp.float32)
    xx = jnp.asarray(xx, jnp.float32)
    # jittered 2x2 quadrant anchors: bounds cross-source blending while
    # keeping every morphology's maximum extent inside the tile
    qc = jnp.asarray(
        [[0.3, 0.3], [0.7, 0.3], [0.3, 0.7], [0.7, 0.7]],
        jnp.float32) * size
    jit_amp = 0.08 * size

    def render_slot(key, quad):
        """-> (field [size,size], cls, box xyxy)."""
        ks = jax.random.split(key, 10)
        cls = jax.random.randint(ks[0], (), 0, 5)
        cx = quad[0] + jax.random.uniform(ks[1], (), minval=-jit_amp,
                                          maxval=jit_amp)
        cy = quad[1] + jax.random.uniform(ks[2], (), minval=-jit_amp,
                                          maxval=jit_amp)
        theta = jax.random.uniform(ks[3], (), minval=0.0, maxval=np.pi)
        ct, st = jnp.cos(theta), jnp.sin(theta)
        u = (xx - cx) * ct + (yy - cy) * st
        v = -(xx - cx) * st + (yy - cy) * ct
        r = jnp.sqrt(u * u + v * v + 1e-9)
        t = jax.random.uniform(ks[4], (8,))

        # -- 1 compact: beam-sized, near-circular ------------------------
        sa_c = (2.0 + 2.0 * t[0]) * px
        sb_c = sa_c / (1.0 + 0.3 * t[1])
        amp_c = 1.0 + 4.0 * t[2]
        f_c = amp_c * jnp.exp(-0.5 * (u ** 2 / sa_c ** 2
                                      + v ** 2 / sb_c ** 2))
        hx_c, hy_c = _ellipse_extents(sa_c, sb_c, ct, st)

        # -- 2 extended: elongated + secondary diffuse component ---------
        sa_e = (6.0 + 5.0 * t[0]) * px
        sb_e = sa_e / (2.2 + 1.8 * t[1])
        amp_e = 0.6 + 1.9 * t[2]
        off_e = 0.8 * sa_e * (2.0 * t[3] - 1.0)
        f_e = (amp_e * jnp.exp(-0.5 * (u ** 2 / sa_e ** 2
                                       + v ** 2 / sb_e ** 2))
               + 0.5 * amp_e * jnp.exp(
                   -0.5 * ((u - off_e) ** 2 / (0.6 * sa_e) ** 2
                           + v ** 2 / sb_e ** 2)))
        hx_e, hy_e = _ellipse_extents(sa_e, sb_e, ct, st)

        # -- 3 extended-multisland: 3 disjoint islands, ONE gt box -------
        nk = 3
        phis = theta + jnp.arange(nk) * (2.0 * np.pi / nk) \
            + 0.3 * (2.0 * jax.random.uniform(ks[5], (nk,)) - 1.0)
        rad = (7.0 + 5.0 * t[4]) * px
        ox = rad * jnp.cos(phis)
        oy = rad * jnp.sin(phis)
        sig_k = (2.0 + 1.0 * jax.random.uniform(ks[6], (nk,))) * px
        amp_k = (1.0 + 3.0 * t[5]) * (0.7 + 0.3
                                      * jax.random.uniform(ks[7], (nk,)))
        f_m = jnp.sum(amp_k[:, None, None] * jnp.exp(
            -(((xx - cx)[None] - ox[:, None, None]) ** 2
              + ((yy - cy)[None] - oy[:, None, None]) ** 2)
            / (2.0 * sig_k[:, None, None] ** 2)), axis=0)
        hx_m = jnp.max(jnp.abs(ox) + 2.0 * sig_k)
        hy_m = jnp.max(jnp.abs(oy) + 2.0 * sig_k)

        # -- 0 spurious: low-amplitude PSF sidelobe ring pattern ---------
        r0 = (4.0 + 4.0 * t[0]) * px
        amp_s = 0.35 + 0.65 * t[2]
        f_s = amp_s * jnp.cos(np.pi * r / r0) \
            * jnp.exp(-r ** 2 / (2.0 * (1.2 * r0) ** 2))
        hx_s = hy_s = 1.5 * r0

        # -- 4 flagged: bright compact + linear artifact stripe ----------
        sa_f = (2.0 + 1.5 * t[0]) * px
        amp_f = 3.0 + 5.0 * t[2]
        wl = (7.0 + 6.0 * t[3]) * px
        ww = (1.0 + 1.0 * t[4]) * px
        f_f = amp_f * jnp.exp(-0.5 * (u ** 2 + v ** 2) / sa_f ** 2) \
            + 0.35 * amp_f * jnp.exp(-0.5 * (v ** 2 / ww ** 2
                                             + u ** 2 / wl ** 2))
        hx_f = jnp.maximum(2.0 * sa_f,
                           2.0 * wl * jnp.abs(ct) + 2.0 * ww * jnp.abs(st))
        hy_f = jnp.maximum(2.0 * sa_f,
                           2.0 * wl * jnp.abs(st) + 2.0 * ww * jnp.abs(ct))

        fields = jnp.stack([f_s, f_c, f_e, f_m, f_f])
        hxs = jnp.stack([hx_s, hx_c, hx_e, hx_m, hx_f])
        hys = jnp.stack([hy_s, hy_c, hy_e, hy_m, hy_f])
        onehot = (jnp.arange(5) == cls)
        field = jnp.sum(jnp.where(onehot[:, None, None], fields, 0.0), 0)
        hx = jnp.sum(jnp.where(onehot, hxs, 0.0))
        hy = jnp.sum(jnp.where(onehot, hys, 0.0))
        box = jnp.stack([cx - hx, cy - hy, cx + hx, cy + hy])
        box = jnp.clip(box, 0.0, float(size))
        return field, cls, box

    def one(key):
        # source-FREE tiles stay in the mix (noise rejection; see
        # train_synth_demo); masked slots' fields are zeroed inside the
        # scan so only the first n_src slots contribute flux
        ks = jax.random.split(key, 4)
        img = noise * jax.random.normal(ks[0], (size, size))
        n_src = jax.random.randint(ks[1], (), 0, max_src + 1)
        perm = jax.random.permutation(ks[2], 4)[:max_src]
        slot_keys = jax.random.split(ks[3], max_src)
        mask = jnp.arange(max_src) < n_src

        def body(im, inp):
            k, q, m = inp
            f, cls, box = render_slot(k, q)
            return im + jnp.where(m, f, 0.0), (cls, box)

        img, (labels, boxes) = jax.lax.scan(
            body, img, (slot_keys, qc[perm], mask))
        lo, hi = img.min(), img.max()
        img = (img - lo) / jnp.maximum(hi - lo, 1e-6)
        return (jnp.repeat(img[:, :, None], 3, -1),
                labels.astype(jnp.int32), boxes, mask)

    @partial(jax.jit, static_argnames=("batch",))
    def make(key, batch: int):
        return jax.vmap(one)(jax.random.split(key, batch))

    return make


def make_multiclass_batch_np(seed: int, batch: int,
                             size: int = NATIVE_SIZE, max_src: int = 4,
                             noise: float = 0.08):
    """Host-side convenience wrapper (CPU jax) returning numpy arrays."""
    import jax
    make = make_multiclass_tile_fn(size=size, max_src=max_src, noise=noise)
    out = make(jax.random.PRNGKey(seed), batch)
    return tuple(np.asarray(o) for o in out)


def write_multiclass_dataset(directory: str, n_images: int,
                             seed: int = 0, size: int = NATIVE_SIZE,
                             max_src: int = 4):
    """Write a YOLO-format disk dataset (FITS cutouts + label txts +
    dataset.yaml) of 5-class synthetic cutouts — lets cli/train.py and
    cli/evaluate.py consume the synthetic task exactly like the
    reference's exported radio dataset (reference macros/run_train.py).
    """
    import os

    from caesar_yolo_tpu.utils.fits import FitsHeader, write_fits

    img_dir = os.path.join(directory, "images")
    lab_dir = os.path.join(directory, "labels")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)
    imgs, labels, boxes, mask = make_multiclass_batch_np(
        seed, n_images, size=size, max_src=max_src)
    header = FitsHeader()
    header["BUNIT"] = "JY/BEAM"
    paths = []
    for i in range(n_images):
        stem = f"synth5_{seed}_{i:05d}"
        fpath = os.path.join(img_dir, stem + ".fits")
        write_fits(imgs[i, :, :, 0].astype(np.float32), fpath, header)
        lines = []
        for j in range(max_src):
            if not mask[i, j]:
                continue
            x0, y0, x1, y1 = boxes[i, j]
            cxn = (x0 + x1) / 2.0 / size
            cyn = (y0 + y1) / 2.0 / size
            wn = (x1 - x0) / size
            hn = (y1 - y0) / size
            lines.append(f"{int(labels[i, j])} {cxn:.6f} {cyn:.6f} "
                         f"{wn:.6f} {hn:.6f}")
        with open(os.path.join(lab_dir, stem + ".txt"), "w") as fh:
            fh.write("\n".join(lines) + ("\n" if lines else ""))
        paths.append(fpath)
    with open(os.path.join(directory, "dataset.yaml"), "w") as fh:
        fh.write("names:\n" + "".join(
            f"  {i}: {n}\n" for i, n in enumerate(CLASS_NAMES)))
    return paths
