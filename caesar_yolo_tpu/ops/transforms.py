"""Preprocessing transforms as pure, jit-able JAX functions.

Functional re-design of the reference's 20 transform classes
(reference preprocessing.py:75-1133).  Every transform is a factory
returning a pure function

    fn(data[H, W, C] float32) -> (data'[H, W, C'], valid: bool scalar)

obeying the reference masking convention: pixels that are exactly 0 or
non-finite are excluded from statistics and restored to 0 afterwards
(e.g. reference preprocessing.py:99-108) — with one reference-mandated
exception (log_stretcher's minmaxnorm=False branch, see its docstring).  `valid=False` marks inputs on
which the reference implementation would have returned None (empty mask,
non-positive channel maxima, ...); the host checks it before prediction,
mirroring the reference's no-prediction paths (evaluation.py:164-176).

Shapes are static under jit; per-channel Python loops unroll at trace
time.  A whole pipeline composes into ONE jitted computation, so XLA
fuses the elementwise chains — the TPU-native replacement for the
reference's one-full-image-copy-per-stage numpy passes.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from caesar_yolo_tpu.ops.histeq import equalize_hist
from caesar_yolo_tpu.utils import portable as _portable
from caesar_yolo_tpu.ops.stats import (
    masked_max,
    masked_min,
    sigma_clip_bounds,
    sigma_clipped_stats,
)
from caesar_yolo_tpu.ops.zscale import zscale_transform

Transform = Callable[[jnp.ndarray], tuple[jnp.ndarray, jnp.ndarray]]

TRUE = jnp.bool_(True)


def valid_mask(x: jnp.ndarray) -> jnp.ndarray:
    """The masking convention: pixel participates iff !=0 and finite."""
    return (x != 0) & jnp.isfinite(x)


def center_box_slices(h: int, w: int, fract: float):
    """Center-box bounds used by mask-box options (ref preprocessing.py:204-215)."""
    xc, yc = int(w / 2), int(h / 2)
    dy, dx = int(h * fract / 2.0), int(w * fract / 2.0)
    return yc - dy, yc + dy, xc - dx, xc + dx


def center_box_mask(h: int, w: int, fract: float) -> jnp.ndarray:
    y0, y1, x0, x1 = center_box_slices(h, w, fract)
    m = jnp.zeros((h, w), dtype=bool)
    return m.at[y0:y1, x0:x1].set(True)


def _per_channel(data, fn):
    """Apply fn(chan, i) -> (chan', valid) over the last axis.  Works
    for both the [H, W, C] per-image and [B, H, W, C] batched layouts
    (fn sees [H, W] or [B, H, W] channels accordingly)."""
    outs, valids = [], []
    for i in range(data.shape[-1]):
        o, v = fn(data[..., i], i)
        outs.append(o)
        valids.append(v)
    valid = valids[0]
    for v in valids[1:]:
        valid = valid & v
    return jnp.stack(outs, axis=-1), valid


# batched alias (fn receives chan[B, H, W] and returns valid[B])
_batch_per_channel = _per_channel


# ---------------------------------------------------------------------------
# Normalizers / scalers
# ---------------------------------------------------------------------------

def min_max_normalizer(norm_min: float = 0.0, norm_max: float = 1.0) -> Transform:
    """Per-channel min-max normalization (ref preprocessing.py:75-111)."""

    def fn(data):
        def ch(x, _):
            cond = valid_mask(x)
            n = jnp.sum(cond)
            lo = masked_min(x, cond)
            hi = masked_max(x, cond)
            span = hi - lo
            out = (x - lo) / jnp.where(span != 0, span, 1.0) \
                * (norm_max - norm_min) + norm_min
            out = jnp.where(cond, out, 0.0)
            return out, (n > 0) & (span != 0)
        return _per_channel(data, ch)

    return fn


def abs_min_max_normalizer(norm_min: float = 0.0, norm_max: float = 1.0) -> Transform:
    """All-channel min-max normalization (ref preprocessing.py:116-145)."""

    def fn(data):
        cond = valid_mask(data)
        lo = masked_min(data, cond)
        hi = masked_max(data, cond)
        span = hi - lo
        out = (data - lo) / jnp.where(span != 0, span, 1.0) \
            * (norm_max - norm_min) + norm_min
        out = jnp.where(cond, out, 0.0)
        return out, (jnp.sum(cond) > 0) & (span != 0)

    return fn


def max_scaler() -> Transform:
    """Divide each channel by its own masked max (ref preprocessing.py:152-176)."""

    def fn(data):
        cond = valid_mask(data)
        mx = masked_max(data, cond, axis=(0, 1))
        out = data / jnp.where(mx != 0, mx, 1.0)
        out = jnp.where(cond, out, 0.0)
        return out, jnp.all(jnp.sum(cond, axis=(0, 1)) > 0)

    return fn


def abs_max_scaler(use_mask_box: bool = False, mask_fract: float = 0.5) -> Transform:
    """Divide by global masked max, optionally within a center box
    (ref preprocessing.py:182-226)."""

    def fn(data):
        h, w, _ = data.shape
        cond = valid_mask(data)
        cond_max = cond
        if use_mask_box:
            cond_max = cond & center_box_mask(h, w, mask_fract)[:, :, None]
        mx = masked_max(data, cond_max)
        out = data / jnp.where(mx != 0, mx, 1.0)
        out = jnp.where(cond, out, 0.0)
        return out, jnp.sum(cond_max) > 0

    return fn


def chan_max_scaler(chref: int = 0, use_mask_box: bool = False,
                    mask_fract: float = 0.5) -> Transform:
    """Divide all channels by the reference channel's masked max
    (ref preprocessing.py:232-289); invalid when any channel's max <= 0."""

    def fn(data):
        h, w, c = data.shape
        if use_mask_box:
            y0, y1, x0, x1 = center_box_slices(h, w, mask_fract)
            region = data[y0:y1, x0:x1, :]
        else:
            region = data
        ref = region[:, :, chref]
        cond_ref = valid_mask(ref)
        mx = masked_max(ref, cond_ref)
        valid = jnp.sum(cond_ref) > 0
        for i in range(c):
            chx = region[:, :, i]
            cond_ch = valid_mask(chx)
            ch_max = masked_max(chx, cond_ch)
            valid = valid & (ch_max > 0) & jnp.isfinite(ch_max)
        cond = valid_mask(data)
        out = data / jnp.where(mx != 0, mx, 1.0)
        out = jnp.where(cond, out, 0.0)
        return out, valid

    return fn


def scaler(scale_factors: Sequence[float]) -> Transform:
    """Multiply channels by fixed factors (ref preprocessing.py:446-474;
    the reference version is unusable due to the self-assignment bug at
    :453 — implemented correctly here, documented in SURVEY quirks)."""
    factors = jnp.asarray(scale_factors, dtype=jnp.float32)

    def fn(data):
        assert data.shape[-1] == factors.shape[0]
        return data * factors, TRUE

    return fn


# ---------------------------------------------------------------------------
# Shifters / standardizers
# ---------------------------------------------------------------------------

def min_shifter(chid: int = -1) -> Transform:
    """Subtract the masked min per channel (ref preprocessing.py:294-327)."""

    def fn(data):
        def ch(x, i):
            if chid != -1 and i != chid:
                return x, TRUE
            cond = valid_mask(x)
            lo = masked_min(x, cond)
            out = jnp.where(cond, x - lo, 0.0)
            return out, jnp.sum(cond) > 0
        return _per_channel(data, ch)

    return fn


def shifter(offsets: Sequence[float]) -> Transform:
    """Subtract fixed per-channel offsets (ref preprocessing.py:333-363)."""
    offs = jnp.asarray(offsets, dtype=jnp.float32)

    def fn(data):
        assert data.shape[-1] == offs.shape[0]
        cond = valid_mask(data)
        return jnp.where(cond, data - offs, 0.0), TRUE

    return fn


def standardizer(means: Sequence[float], sigmas: Sequence[float]) -> Transform:
    """(x - mean) / sigma with fixed per-channel stats
    (ref preprocessing.py:369-403)."""
    mu = jnp.asarray(means, dtype=jnp.float32)
    sd = jnp.asarray(sigmas, dtype=jnp.float32)

    def fn(data):
        assert data.shape[-1] == mu.shape[0] == sd.shape[0]
        cond = valid_mask(data)
        return jnp.where(cond, (data - mu) / sd, 0.0), TRUE

    return fn


def negative_data_fixer() -> Transform:
    """Shift entirely-non-positive channels to min (ref preprocessing.py:408-440)."""

    def fn(data):
        def ch(x, _):
            cond = valid_mask(x)
            lo = masked_min(x, cond)
            hi = masked_max(x, cond)
            shifted = jnp.where(cond, x - lo, 0.0)
            return jnp.where(hi > 0, x, shifted), TRUE
        return _per_channel(data, ch)

    return fn


# ---------------------------------------------------------------------------
# Stretches / clips
# ---------------------------------------------------------------------------

def log_stretcher(chid: int = -1, minmaxnorm: bool = False,
                  data_norm_min: float = -6.0, data_norm_max: float = 6.0,
                  clip_neg: bool = False) -> Transform:
    """log10 stretch (ref preprocessing.py:480-539).

    NOTE the reference's inverted chid semantics: chid selects the channel
    to SKIP (preprocessing.py:487,506), replicated here.

    PARITY NOTE: with minmaxnorm=False (the default) masked pixels
    (exactly-0 / non-finite) come out at lg_min, NOT restored to 0 —
    an intentional deviation from this module's masking convention
    because the reference does exactly that (preprocessing.py:524
    ``data_ch_lg[~cond_ch] = data_ch_lg_min``; only the minmaxnorm
    branch restores 0 at :534).  A downstream min_max_normalizer will
    therefore treat those pixels as real data, as it does in the
    reference chain.
    """

    def fn(data):
        def ch(x, i):
            if chid != -1 and i == chid:
                return x, TRUE
            badpix = (x == 0) | ~jnp.isfinite(x)
            cond = (x > 0) & jnp.isfinite(x)
            npos = jnp.sum(cond)
            lg = jnp.where(cond, jnp.log10(jnp.where(cond, x, 1.0)), 0.0)
            lg_min = masked_min(lg, cond)
            lg = jnp.where(cond, lg, lg_min)
            if minmaxnorm:
                lg = (lg - data_norm_min) / (data_norm_max - data_norm_min)
                if clip_neg:
                    lg = jnp.where(lg < 0, 0.0, lg)
                lg = jnp.where(badpix, 0.0, lg)
            return lg, npos > 0
        return _per_channel(data, ch)

    return fn


def border_masker(mask_fract: float = 0.7) -> Transform:
    """Zero all pixels outside the center box (ref preprocessing.py:544-586)."""

    def fn(data):
        h, w, _ = data.shape
        box = center_box_mask(h, w, mask_fract)[:, :, None]
        return jnp.where(box, data, 0.0), TRUE

    return fn


def bkg_subtractor(sigma: float = 3.0, use_mask_box: bool = False,
                   mask_fract: float = 0.7, chid: int = -1) -> Transform:
    """Subtract the sigma-clipped mean background per channel
    (ref preprocessing.py:591-658).  With use_mask_box, the CENTER box is
    excluded from the background estimate (source region)."""

    def fn(data):
        data = jnp.asarray(data)  # .at update below needs a jnp array
        h, w, _ = data.shape
        if use_mask_box:
            y0, y1, x0, x1 = center_box_slices(h, w, mask_fract)

        def ch(x, i):
            if chid != -1 and i != chid:
                return x, TRUE
            cond = valid_mask(x)
            bkgdata = x
            if use_mask_box:
                bkgdata = bkgdata.at[y0:y1, x0:x1].set(0.0)
            cond_bkg = valid_mask(bkgdata)
            bkgval, _, _, _, _, nvalid = sigma_clipped_stats(
                bkgdata, cond_bkg, sigma, sigma)
            out = jnp.where(cond, x - bkgval, 0.0)
            return out, nvalid > 0
        return _per_channel(data, ch)

    from caesar_yolo_tpu.ops.pallas_stats import sigma_clipped_stats_batch

    def batch(data):                                       # [B, H, W, C]
        b, h, w, _ = data.shape

        def ch(x, i):                                      # [B, H, W]
            if chid != -1 and i != chid:
                return x, jnp.ones(b, bool)
            cond = valid_mask(x)
            bkgdata = x
            if use_mask_box:
                box = center_box_mask(h, w, mask_fract)
                bkgdata = jnp.where(box[None, :, :], 0.0, bkgdata)
            cond_bkg = valid_mask(bkgdata)
            bkgval, _, _, _, _, nvalid = sigma_clipped_stats_batch(
                bkgdata, cond_bkg, sigma, sigma)
            out = jnp.where(cond, x - bkgval[:, None, None], 0.0)
            return out, nvalid > 0
        return _batch_per_channel(data, ch)

    fn.batch = batch
    return fn


def sigma_clip_shifter(sigma: float = 1.0, chid: int = -1) -> Transform:
    """Galvin+2019 clip-shift: newzero = clipped_mean + sigma*std; subtract
    and clip below 0 (ref preprocessing.py:664-717)."""

    def fn(data):
        def ch(x, i):
            if chid != -1 and i != chid:
                return x, TRUE
            cond = valid_mask(x)
            clipmean, _, std, _, _, nvalid = sigma_clipped_stats(
                x, cond, sigma, sigma)
            newzero = clipmean + sigma * std
            out = x - newzero
            out = jnp.where(out < 0, 0.0, out)
            out = jnp.where(cond, out, 0.0)
            return out, nvalid > 0
        return _per_channel(data, ch)

    from caesar_yolo_tpu.ops.pallas_stats import sigma_clipped_stats_batch

    def batch(data):                                       # [B, H, W, C]
        b = data.shape[0]

        def ch(x, i):                                      # [B, H, W]
            if chid != -1 and i != chid:
                return x, jnp.ones(b, bool)
            cond = valid_mask(x)
            clipmean, _, std, _, _, nvalid = sigma_clipped_stats_batch(
                x, cond, sigma, sigma)
            newzero = (clipmean + sigma * std)[:, None, None]
            out = x - newzero
            out = jnp.where(out < 0, 0.0, out)
            out = jnp.where(cond, out, 0.0)
            return out, nvalid > 0
        return _batch_per_channel(data, ch)

    fn.batch = batch
    return fn


def sigma_clipper(sigma_low: float = 10.0, sigma_up: float = 10.0,
                  chid: int = -1) -> Transform:
    """Clamp pixels to the final sigma-clip bounds (ref preprocessing.py:723-771)."""

    def fn(data):
        def ch(x, i):
            if chid != -1 and i != chid:
                return x, TRUE
            cond = valid_mask(x)
            lower, upper = sigma_clip_bounds(x, cond, sigma_low, sigma_up)
            out = jnp.clip(x, lower, upper)
            out = jnp.where(cond, out, 0.0)
            return out, jnp.sum(cond) > 0
        return _per_channel(data, ch)

    from caesar_yolo_tpu.ops.pallas_stats import sigma_clip_bounds_batch

    def batch(data):                                       # [B, H, W, C]
        b = data.shape[0]

        def ch(x, i):                                      # [B, H, W]
            if chid != -1 and i != chid:
                return x, jnp.ones(b, bool)
            cond = valid_mask(x)
            lower, upper = sigma_clip_bounds_batch(
                x, cond, sigma_low, sigma_up)
            out = jnp.clip(x, lower[:, None, None], upper[:, None, None])
            out = jnp.where(cond, out, 0.0)
            return out, jnp.sum(cond, axis=(1, 2)) > 0
        return _batch_per_channel(data, ch)

    fn.batch = batch
    return fn


# ---------------------------------------------------------------------------
# Geometry / channel plumbing
# ---------------------------------------------------------------------------

def resizer(resize_size: int, upscale: bool = False,
            set_pad_val_to_min: bool = True) -> Transform:
    """Aspect-preserving resize + center pad to a square
    (ref preprocessing.py:776-857 via utils.resize_img_v2 'square' mode).

    upscale=False pads small images instead of scaling them up."""

    def fn(data):
        h, w, c = data.shape
        scale = 1.0
        if upscale:
            scale = max(1.0, resize_size / min(h, w))
        if round(max(h, w) * scale) > resize_size:
            scale = resize_size / max(h, w)
        nh, nw = round(h * scale), round(w * scale)
        out = data
        if scale != 1.0:
            out = jax.image.resize(out, (nh, nw, c), method="linear")
        top = (resize_size - nh) // 2
        left = (resize_size - nw) // 2
        out = jnp.pad(out, ((top, resize_size - nh - top),
                            (left, resize_size - nw - left), (0, 0)))
        if set_pad_val_to_min:
            cond = valid_mask(out)
            mins = []
            for i in range(c):
                mins.append(masked_min(out[:, :, i], cond[:, :, i]))
            out = jnp.where(cond, out, jnp.stack(mins))
        return out, TRUE

    return fn


def chan_divider(chref: int = 0, logtransf: bool = False,
                 strip_chref: bool = False, trim: bool = False,
                 trim_min: float = -6.0, trim_max: float = 6.0) -> Transform:
    """Divide channels by a reference channel (ref preprocessing.py:864-928).

    The reference's strip_chref branch NameErrors (preprocessing.py:925
    uses `chref` unqualified); implemented correctly here."""

    def fn(data):
        cond = valid_mask(data)
        ref = data[:, :, chref]
        cond_ref = valid_mask(ref)
        denom = jnp.where(ref == 0, 1.0, ref)
        chans = []
        for i in range(data.shape[-1]):
            if i == chref:
                chans.append(ref)
            else:
                dn = data[:, :, i] / denom
                chans.append(jnp.where(cond_ref, dn, 0.0))
        out = jnp.stack(chans, axis=-1)
        out = jnp.where(cond, out, 0.0)
        if logtransf:
            tr = jnp.where(out <= 0, 1.0, out)
            tr = jnp.log10(tr)
            tr = jnp.where(cond, tr, 0.0)
            if trim:
                tr = jnp.clip(tr, trim_min, trim_max)
            tr = tr.at[:, :, chref].set(out[:, :, chref])
            out = tr
        if strip_chref:
            keep = [i for i in range(out.shape[-1]) if i != chref]
            out = out[:, :, keep]
        return out, TRUE

    return fn


def zscale_transformer(contrasts: Sequence[float] = (0.25, 0.25, 0.25)) -> Transform:
    """Per-channel zscale stretch (ref preprocessing.py:934-971).  The
    transform sees the full channel (zeros included); masked pixels are
    restored to 0 afterwards."""

    def fn(data):
        c = data.shape[-1]
        assert len(contrasts) >= c, (
            f"Invalid contrasts given (size={len(contrasts)} < nchans={c})")
        cond = valid_mask(data)
        chans = [zscale_transform(data[:, :, i], contrast=float(contrasts[i]))
                 for i in range(c)]
        out = jnp.stack(chans, axis=-1)
        return jnp.where(cond, out, 0.0), TRUE

    return fn


def hist_equalizer(adaptive: bool = False, clip_limit: float = 0.03) -> Transform:
    """Per-channel histogram equalization (ref preprocessing.py:977-1012).

    adaptive=True uses CLAHE (reference: skimage equalize_adapthist).

    The batched path routes through Pallas kernels (ops/pallas_histeq):
    both XLA formulations of the 256-bin histogram mis-lower on the TPU
    backend (scatter hangs; the one-hot reduce materializes [N, 256] in
    HBM — see the module docstring there for measurements)."""
    if adaptive:
        from caesar_yolo_tpu.ops.clahe import equalize_adapthist

        def eq(chan):
            return equalize_adapthist(chan, clip_limit=clip_limit)
    else:
        eq = equalize_hist

    def fn(data):
        cond = valid_mask(data)
        chans = [eq(data[:, :, i]) for i in range(data.shape[-1])]
        out = jnp.stack(chans, axis=-1)
        return jnp.where(cond, out, 0.0), TRUE

    if adaptive:
        from caesar_yolo_tpu.ops.pallas_clahe import equalize_adapthist_batch

        def eq_batch(chans):
            return equalize_adapthist_batch(chans, clip_limit=clip_limit)
    else:
        from caesar_yolo_tpu.ops.pallas_histeq import equalize_hist_batch

        eq_batch = equalize_hist_batch

    def batch(data):                                      # [B, H, W, C]
        cond = valid_mask(data)
        chans = [eq_batch(data[..., i]) for i in range(data.shape[-1])]
        out = jnp.stack(chans, axis=-1)
        return (jnp.where(cond, out, 0.0),
                jnp.ones(data.shape[0], bool))

    fn.batch = batch
    return fn


def chan_resizer(nchans: int) -> Transform:
    """Replicate the last channel up to nchans / truncate down
    (ref preprocessing.py:1077-1133)."""
    assert 0 < nchans <= 1000

    def fn(data):
        cur = data.shape[-1]
        if nchans == cur:
            return data, TRUE
        if nchans > cur:
            extra = jnp.repeat(data[:, :, cur - 1:cur], nchans - cur, axis=-1)
            return jnp.concatenate([data, extra], axis=-1), TRUE
        return data[:, :, :nchans], TRUE

    return fn


def chan3_transformer(sigma_clip_baseline: float = 0.0,
                      sigma_clip_low: float = 1.0,
                      sigma_clip_up: float = 20.0,
                      zscale_contrast: float = 0.25) -> Transform:
    """3-channel composite transform (ref preprocessing.py:1020-1072):
      ch1 = zscale(sigmaclip(baseline, up));
      ch2 = zscale(sigmaclip(low, up));
      ch3 = histeq(raw)."""
    to3 = chan_resizer(3)
    clip1 = sigma_clipper(sigma_clip_baseline, sigma_clip_up)
    clip2 = sigma_clipper(sigma_clip_low, sigma_clip_up)
    zs = zscale_transformer([zscale_contrast])
    he = hist_equalizer()

    def fn(data):
        cube, v0 = to3(data)

        def one(chan2d, stages):
            x = chan2d[:, :, None]
            valid = TRUE
            for s in stages:
                x, v = s(x)
                valid = valid & v
            return x[:, :, 0], valid

        c1, v1 = one(cube[:, :, 0], [clip1, zs])
        c2, v2 = one(cube[:, :, 1], [clip2, zs])
        c3, v3 = one(cube[:, :, 2], [he])
        out = jnp.stack([c1, c2, c3], axis=-1)
        return out, v0 & v1 & v2 & v3

    from caesar_yolo_tpu.ops.pallas_histeq import equalize_hist_batch

    def batch(data):                                       # [B, H, W, C]
        b = data.shape[0]
        cur = data.shape[-1]
        if cur < 3:
            extra = jnp.repeat(data[..., cur - 1:cur], 3 - cur, axis=-1)
            cube = jnp.concatenate([data, extra], axis=-1)
        else:
            cube = data[..., :3]

        def one(chan_b, clip_stage):
            x4, va = clip_stage.batch(chan_b[..., None])
            x4, vb = jax.vmap(zs)(x4)
            return x4[..., 0], va & vb

        c1, v1 = one(cube[..., 0], clip1)
        c2, v2 = one(cube[..., 1], clip2)
        raw3 = cube[..., 2]
        cond3 = valid_mask(raw3)
        c3 = jnp.where(cond3, equalize_hist_batch(raw3), 0.0)
        out = jnp.stack([c1, c2, c3], axis=-1)
        return out, v1 & v2 & jnp.ones(b, bool)

    fn.batch = batch
    return fn


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------

class Pipeline:
    """Composed preprocessing pipeline, jitted as ONE computation.

    Equivalent of the reference DataPreprocessor (preprocessing.py:47-67)
    but stages fuse under XLA instead of materializing a full-image numpy
    copy per stage.  Stages apply in list order.

    __call__(data[H, W, C]) -> (data', valid)  — jit-compiled per shape.
    """

    def __init__(self, stages: Sequence[Transform], fused_batch=None):
        self.stages = list(stages)
        # Optional hand-fused Pallas variant: a callable (tiles[B,H,W,1])
        # -> (out, valid[B]) implementing the SAME semantics as the stage
        # chain as one VMEM-resident kernel (set by build_preprocessor
        # when the stage pattern has one).  NOT used by default: measured
        # on v5e the XLA-fused chain is faster both inside the detect
        # program (19.6 vs 20.4 ms/batch-128) and standalone (1.91 vs
        # 2.87 ms) — the pallas_call is an opaque fusion barrier while
        # XLA fuses the whole chain itself.  Kept opt-in via
        # apply_batch(use_fused=True) with parity tests.
        self.fused_batch = fused_batch

        def run(data):
            data = jnp.asarray(data, dtype=jnp.float32)
            valid = TRUE
            for stage in self.stages:
                data, v = stage(data)
                valid = valid & v
            return data, valid

        self.apply = run  # pure, un-jitted (for fusing into larger programs)
        self._run = jax.jit(run)
        # jitted batch program (compiled once per shape): single-image
        # callers route through THIS with a [1, ...] batch so stages
        # with native batch kernels (hist-eq/CLAHE/sigma-clip Pallas)
        # take them — the per-image XLA formulations of those
        # histograms are the ones that hang real TPUs.  `native` is a
        # STATIC argument (not read from portable.FORCE inside the
        # trace) so the jit cache never serves a trace made under the
        # opposite portability mode.
        self._run_batch = jax.jit(
            lambda tiles, native: self.apply_batch(tiles, native=native),
            static_argnums=1)

    def __call__(self, data):
        # On TPU backends route through the compiled batch-of-one path
        # so stages with native batch kernels take them — the per-image
        # XLA histogram formulations (hist-eq/CLAHE) hang real TPUs
        # (ops/pallas_histeq.py).  On CPU the per-image XLA chain is
        # safe and avoids interpret-mode Pallas cost.
        if jax.default_backend() in ("tpu", "axon"):
            return self.apply_one(data)
        return self._run(data)

    def apply_one(self, img):
        """[H, W, C] -> (out, valid) through the compiled BATCH path
        (as a batch of one) — identical numerics to apply_batch."""
        out, valid = self._run_batch(jnp.asarray(img)[None],
                                     not _portable.FORCE)
        return out[0], valid[0]

    def apply_batch(self, tiles, out_dtype=jnp.float32, use_fused=False,
                    native=None):
        """[B, H, W, C] -> (out, valid[B]).  Pure — traceable inside
        larger jitted programs.  The default path vmaps each stage and
        lets XLA fuse the chain (measured faster than the hand-fused
        Pallas kernel, see __init__) — EXCEPT stages that provide a
        native batch implementation (`stage.batch`), which run as-is:
        hist-eq-bearing stages must bypass vmap+XLA because their
        histogram mis-lowers there (see ops/pallas_histeq).
        `use_fused=True` opts into the whole-pipeline Pallas variant
        when the stage pattern has one and input is single-channel.
        Math is f32 either way; `out_dtype` casts the output.
        `native=False` (portable.FORCE / export tracing) skips the
        native batch paths — their Mosaic kernels would not lower for
        non-TPU platforms; None reads the flag at trace time."""
        if (use_fused and self.fused_batch is not None
                and tiles.shape[-1] == 1):
            return self.fused_batch(tiles, out_dtype=out_dtype)
        if native is None:
            native = not _portable.FORCE
        out = jnp.asarray(tiles, dtype=jnp.float32)
        valid = jnp.ones(tiles.shape[0], bool)
        for stage in self.stages:
            batch_fn = getattr(stage, "batch", None)
            if batch_fn is not None and native:
                out, v = batch_fn(out)
            else:
                out, v = jax.vmap(stage)(out)
            valid = valid & v
        return out.astype(out_dtype), valid

    def batched(self):
        """jitted batch variant for [B, H, W, C] tile batches."""
        return jax.jit(self.apply_batch)


def build_preprocessor(
    *,
    subtract_bkg: bool = False, sigma_bkg: float = 3.0,
    use_box_mask_in_bkg: bool = False, bkg_box_mask_fract: float = 0.7,
    bkg_chid: int = -1,
    clip_shift_data: bool = False, sigma_clip: float = 1.0,
    clip_data: bool = False, sigma_clip_low: float = 10.0,
    sigma_clip_up: float = 10.0, clip_chid: int = -1,
    nchannels: int = 1,
    zscale_stretch: bool = False, zscale_contrasts=(0.25, 0.25, 0.25),
    chan3_preproc: bool = False, sigma_clip_baseline: float = 0.0,
    normalize_minmax: bool = False, norm_min: float = 0.0,
    norm_max: float = 1.0,
) -> Pipeline | None:
    """Assemble the stage list exactly as the reference CLI does
    (reference scripts/run.py:272-302).  Returns None when no stage is
    enabled."""
    stages: list[Transform] = []
    if subtract_bkg:
        stages.append(bkg_subtractor(
            sigma=sigma_bkg, use_mask_box=use_box_mask_in_bkg,
            mask_fract=bkg_box_mask_fract, chid=bkg_chid))
    if clip_shift_data:
        stages.append(sigma_clip_shifter(sigma=sigma_clip, chid=clip_chid))
    if clip_data:
        stages.append(sigma_clipper(
            sigma_low=sigma_clip_low, sigma_up=sigma_clip_up, chid=clip_chid))
    if nchannels > 1:
        stages.append(chan_resizer(nchans=nchannels))
    if zscale_stretch:
        stages.append(zscale_transformer(contrasts=zscale_contrasts))
    if chan3_preproc:
        stages.append(chan3_transformer(
            sigma_clip_baseline=sigma_clip_baseline,
            sigma_clip_low=sigma_clip_low, sigma_clip_up=sigma_clip_up,
            zscale_contrast=float(zscale_contrasts[0])))
    if normalize_minmax:
        stages.append(min_max_normalizer(norm_min=norm_min, norm_max=norm_max))
    if not stages:
        return None
    fused = None
    if (zscale_stretch and normalize_minmax and not subtract_bkg
            and not clip_shift_data and not clip_data and nchannels <= 1
            and not chan3_preproc
            and len({float(c) for c in zscale_contrasts}) == 1):
        # README-default preprocessing (reference test/run_inference.sh):
        # zscale + minmax has a fused two-pass Pallas implementation
        from functools import partial as _partial

        from caesar_yolo_tpu.ops.pallas_preproc import fused_zscale_minmax
        fused = _partial(fused_zscale_minmax,
                         contrast=float(zscale_contrasts[0]),
                         norm_min=float(norm_min), norm_max=float(norm_max))
    return Pipeline(stages, fused_batch=fused)
