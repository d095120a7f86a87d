"""Preprocessing transform tests: masked-pixel invariants and reference
formula parity (reference preprocessing.py:75-1133)."""

import numpy as np
import pytest

from caesar_yolo_tpu.ops import transforms as T
from caesar_yolo_tpu.utils import read_fits


def mkimg(rng, h=40, w=40, c=1, holes=True):
    x = rng.normal(5.0, 2.0, (h, w, c)).astype(np.float32)
    if holes:
        x[2:6, 3:9, :] = 0.0  # masked pixels
    return x


def test_minmax_normalizer(rng):
    x = mkimg(rng)
    out, valid = T.min_max_normalizer(0.0, 1.0)(x)
    out = np.asarray(out)
    assert bool(valid)
    mask = (x[:, :, 0] != 0)
    assert out[:, :, 0][mask].min() == pytest.approx(0.0, abs=1e-6)
    assert out[:, :, 0][mask].max() == pytest.approx(1.0, abs=1e-6)
    assert np.all(out[~np.asarray(mask)] == 0)  # holes restored to 0


def test_minmax_normalizer_range_255(rng):
    x = mkimg(rng)
    out, _ = T.min_max_normalizer(0.0, 255.0)(x)
    m = x[:, :, 0] != 0
    assert float(np.asarray(out)[:, :, 0][m].max()) == pytest.approx(255.0, rel=1e-5)


def test_minmax_invalid_on_empty_channel():
    x = np.zeros((10, 10, 1), np.float32)
    _, valid = T.min_max_normalizer()(x)
    assert not bool(valid)


def test_abs_minmax_uses_global_range(rng):
    x = mkimg(rng, c=2)
    x[:, :, 1] *= 10
    out, valid = T.abs_min_max_normalizer()(x)
    out = np.asarray(out)
    mask = x != 0
    assert out[mask].max() == pytest.approx(1.0, abs=1e-5)
    # channel 0 cannot reach 1.0 since global max is in channel 1
    assert out[:, :, 0].max() < 0.5


def test_max_scaler_per_channel(rng):
    x = mkimg(rng, c=2)
    out, valid = T.max_scaler()(x)
    out = np.asarray(out)
    for i in range(2):
        m = x[:, :, i] != 0
        assert out[:, :, i][m].max() == pytest.approx(1.0, rel=1e-5)


def test_abs_max_scaler_box(rng):
    x = mkimg(rng, holes=False)
    x[0, 0, 0] = 1000.0  # big value at border, outside center box
    out_nobox, _ = T.abs_max_scaler(use_mask_box=False)(x)
    out_box, _ = T.abs_max_scaler(use_mask_box=True, mask_fract=0.5)(x)
    assert np.asarray(out_nobox).max() == pytest.approx(1.0, rel=1e-5)
    assert np.asarray(out_box).max() > 10  # scaled by smaller (box) max


def test_chan_max_scaler(rng):
    x = mkimg(rng, c=3, holes=False)
    x[:, :, 1] *= 3
    out, valid = T.chan_max_scaler(chref=0)(x)
    assert bool(valid)
    m = x[:, :, 0] != 0
    assert np.asarray(out)[:, :, 0].max() == pytest.approx(1.0, rel=1e-5)
    # negative channel -> invalid
    x2 = x.copy()
    x2[:, :, 2] = -np.abs(x2[:, :, 2])
    _, valid2 = T.chan_max_scaler(chref=0)(x2)
    assert not bool(valid2)


def test_min_shifter_and_chid(rng):
    x = mkimg(rng, c=2)
    out, _ = T.min_shifter(chid=1)(x)
    out = np.asarray(out)
    np.testing.assert_array_equal(out[:, :, 0], x[:, :, 0])  # untouched
    m = x[:, :, 1] != 0
    assert out[:, :, 1][m].min() == pytest.approx(0.0, abs=1e-6)


def test_shifter_standardizer(rng):
    x = mkimg(rng, c=2, holes=True)
    out, _ = T.shifter([1.0, 2.0])(x)
    m = x != 0
    np.testing.assert_allclose(np.asarray(out)[m],
                               (x - np.array([1.0, 2.0]))[m], rtol=1e-5)
    out2, _ = T.standardizer([5.0, 5.0], [2.0, 2.0])(x)
    np.testing.assert_allclose(np.asarray(out2)[m],
                               ((x - 5.0) / 2.0)[m], rtol=1e-4)
    assert np.all(np.asarray(out2)[~m] == 0)


def test_negative_data_fixer(rng):
    x = mkimg(rng, c=2)
    x[:, :, 1] = -np.abs(x[:, :, 1])  # entirely negative channel
    out, _ = T.negative_data_fixer()(x)
    out = np.asarray(out)
    np.testing.assert_array_equal(out[:, :, 0], x[:, :, 0])
    m = x[:, :, 1] != 0
    assert out[:, :, 1][m].min() == pytest.approx(0.0, abs=1e-6)


def test_scaler(rng):
    x = mkimg(rng, c=2, holes=False)
    out, _ = T.scaler([2.0, 0.5])(x)
    np.testing.assert_allclose(np.asarray(out),
                               x * np.array([2.0, 0.5]), rtol=1e-6)


def test_log_stretcher_skips_chid(rng):
    x = np.abs(mkimg(rng, c=2)) + 0.1
    x[2:6, 3:9, :] = 0.0
    out, valid = T.log_stretcher(chid=0)(x)  # chid SKIPS channel 0
    out = np.asarray(out)
    assert bool(valid)
    np.testing.assert_array_equal(out[:, :, 0], x[:, :, 0])
    m = (x[:, :, 1] > 0)
    # XLA's float32 log10 differs from numpy's by a few ULP
    np.testing.assert_allclose(out[:, :, 1][m], np.log10(x[:, :, 1][m]),
                               rtol=1e-3, atol=1e-5)
    # non-positive pixels get the min of the log channel
    assert out[:, :, 1][~m].min() == pytest.approx(out[:, :, 1][m].min())


def test_border_masker(rng):
    x = mkimg(rng, holes=False)
    out, _ = T.border_masker(mask_fract=0.5)(x)
    out = np.asarray(out)
    assert np.all(out[0, :, :] == 0)
    assert np.all(out[:, 0, :] == 0)
    assert np.all(out[12:28, 12:28, :] == x[12:28, 12:28, :])


def test_bkg_subtractor_removes_offset(rng):
    x = rng.normal(0.0, 0.1, (64, 64, 1)).astype(np.float32) + 10.0
    out, valid = T.bkg_subtractor(sigma=3.0)(x)
    assert bool(valid)
    assert abs(float(np.asarray(out).mean())) < 0.05  # offset removed


def test_bkg_subtractor_box_excludes_source(rng):
    x = rng.normal(0.0, 0.1, (64, 64, 1)).astype(np.float32) + 1.0
    x[24:40, 24:40, 0] += 50.0  # bright center source
    out_box, _ = T.bkg_subtractor(sigma=3.0, use_mask_box=True,
                                  mask_fract=0.7)(x)
    border = np.asarray(out_box)[:5, :, 0]
    assert abs(border.mean()) < 0.05  # background from borders only


def test_sigma_clip_shifter(rng):
    x = rng.normal(2.0, 1.0, (64, 64, 1)).astype(np.float32)
    out, valid = T.sigma_clip_shifter(sigma=1.0)(x)
    out = np.asarray(out)
    assert bool(valid)
    assert out.min() >= 0.0  # clipped at zero
    assert (out > 0).sum() < (x != 0).sum()  # noise floor removed


def test_sigma_clipper_clamps(rng):
    x = rng.normal(0.0, 1.0, (64, 64, 1)).astype(np.float32)
    x[0, 0, 0] = 500.0
    x[0, 1, 0] = -500.0
    out, _ = T.sigma_clipper(sigma_low=3.0, sigma_up=3.0)(x)
    out = np.asarray(out)
    assert out.max() < 10.0 and out.min() > -10.0
    # clamped values equal the bounds
    assert out[0, 0, 0] == out.max()


def test_resizer_pad_small(rng):
    x = mkimg(rng, h=20, w=30, c=1, holes=False)
    out, _ = T.resizer(64, upscale=False, set_pad_val_to_min=False)(x)
    out = np.asarray(out)
    assert out.shape == (64, 64, 1)
    top, left = (64 - 20) // 2, (64 - 30) // 2
    np.testing.assert_allclose(out[top:top + 20, left:left + 30, 0],
                               x[:, :, 0], rtol=1e-5)
    assert np.all(out[:top] == 0)


def test_resizer_downscale(rng):
    x = mkimg(rng, h=100, w=80, c=1, holes=False)
    out, _ = T.resizer(64, set_pad_val_to_min=False)(x)
    assert np.asarray(out).shape == (64, 64, 1)


def test_resizer_pad_to_min(rng):
    x = np.abs(mkimg(rng, h=20, w=20, c=1, holes=False)) + 1.0
    out, _ = T.resizer(32, set_pad_val_to_min=True)(x)
    out = np.asarray(out)
    assert out.min() == pytest.approx(x.min(), rel=1e-5)  # pad = min, not 0


def test_chan_divider(rng):
    x = np.abs(mkimg(rng, c=3, holes=False)) + 1.0
    out, _ = T.chan_divider(chref=0)(x)
    out = np.asarray(out)
    np.testing.assert_allclose(out[:, :, 0], x[:, :, 0], rtol=1e-6)
    np.testing.assert_allclose(out[:, :, 1], x[:, :, 1] / x[:, :, 0], rtol=1e-5)
    out2, _ = T.chan_divider(chref=0, strip_chref=True)(x)
    assert np.asarray(out2).shape[-1] == 2


def test_zscale_transformer_shapes_and_mask(rng):
    x = mkimg(rng, c=3)
    out, valid = T.zscale_transformer([0.25, 0.25, 0.25])(x)
    out = np.asarray(out)
    assert bool(valid)
    assert out.shape == x.shape
    assert out.min() >= 0 and out.max() <= 1
    assert np.all(out[x == 0] == 0)


def test_hist_equalizer(rng):
    x = mkimg(rng, c=1)
    out, _ = T.hist_equalizer()(x)
    out = np.asarray(out)
    assert out.min() >= 0 and out.max() <= 1.0001
    assert np.all(out[x == 0] == 0)


def test_chan_resizer_expand_truncate(rng):
    x = mkimg(rng, c=1)
    out, _ = T.chan_resizer(3)(x)
    out = np.asarray(out)
    assert out.shape[-1] == 3
    np.testing.assert_array_equal(out[:, :, 1], x[:, :, 0])
    np.testing.assert_array_equal(out[:, :, 2], x[:, :, 0])
    x3 = mkimg(rng, c=3)
    out2, _ = T.chan_resizer(2)(x3)
    np.testing.assert_array_equal(np.asarray(out2), x3[:, :, :2])


def test_chan3_transformer(rng):
    x = mkimg(rng, c=1)
    out, valid = T.chan3_transformer()(x)
    out = np.asarray(out)
    assert bool(valid)
    assert out.shape == (40, 40, 3)
    assert out.min() >= 0 and out.max() <= 1.0001
    # channels should differ (different transforms)
    assert not np.allclose(out[:, :, 0], out[:, :, 2])


def test_pipeline_order_and_composition(rng):
    x = mkimg(rng)
    # scaling then minmax == minmax alone (scale is normalized away; a
    # min-shift would NOT compose like this because the shifted minimum
    # becomes 0 and joins the masked set — the reference convention)
    p = T.Pipeline([T.scaler([2.0]), T.min_max_normalizer()])
    out, valid = p(x)
    assert bool(valid)
    ref, _ = T.min_max_normalizer()(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_build_preprocessor_reference_sample_config(galaxy_fits_path):
    """The README sample config: zscale + minmax 0-255 on the real image
    (reference test/run_inference.sh)."""
    data, _, _ = read_fits(galaxy_fits_path)
    img = np.repeat(data[:, :, None], 3, axis=2)
    pipe = T.build_preprocessor(
        zscale_stretch=True, zscale_contrasts=(0.25, 0.25, 0.25),
        normalize_minmax=True, norm_min=0.0, norm_max=255.0)
    out, valid = pipe(img)
    out = np.asarray(out)
    assert bool(valid)
    assert out.shape == (132, 132, 3)
    assert out.min() >= 0 and out.max() == pytest.approx(255.0, rel=1e-5)


def test_build_preprocessor_chan3(galaxy_fits_path):
    data, _, _ = read_fits(galaxy_fits_path)
    pipe = T.build_preprocessor(
        subtract_bkg=True, clip_shift_data=False, chan3_preproc=True,
        sigma_clip_low=1.0, sigma_clip_up=20.0, nchannels=1)
    out, valid = pipe(data[:, :, None])
    assert bool(valid)
    assert np.asarray(out).shape == (132, 132, 3)


def test_build_preprocessor_none():
    assert T.build_preprocessor() is None


def test_clahe_basic(rng):
    """CLAHE output: in [0,1], enhances local contrast of a flat-ish
    region more than global hist-eq keeps masked pixels at 0."""
    from caesar_yolo_tpu.ops.clahe import equalize_adapthist
    x = rng.normal(0.5, 0.02, (96, 96)).astype(np.float32)
    x[40:56, 40:56] += 3.0  # bright blob compresses the global histogram
    out = np.asarray(equalize_adapthist(x))
    assert out.shape == x.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    # local contrast in a background corner is stretched vs the raw data
    corner = out[:32, :32]
    assert corner.std() > 0.04  # raw corner std is 0.02


def test_hist_equalizer_adaptive_path(rng):
    x = rng.random((64, 64, 1), dtype=np.float32) + 0.1
    x[2:6, 3:9, :] = 0.0
    out, valid = T.hist_equalizer(adaptive=True)(x)
    out = np.asarray(out)
    assert bool(valid)
    assert np.all(out[2:6, 3:9, 0] == 0)  # masked pixels restored
    assert 0.0 <= out.min() and out.max() <= 1.0


def np_clahe_twin(img, clip_limit=0.03, nbins=256, grid=8):
    """Independent numpy CLAHE (published Zuiderveld algorithm, written
    with per-tile loops — deliberately different code structure from the
    vectorized JAX kernel it oracles)."""
    img = np.asarray(img, np.float64)
    h, w = img.shape
    vmin, vmax = img.min(), img.max()
    norm = (img - vmin) / (vmax - vmin if vmax > vmin else 1.0)
    bins = np.clip((norm * nbins).astype(np.int64), 0, nbins - 1)
    th, tw = -(-h // grid), -(-w // grid)
    bins_p = np.pad(bins, ((0, th * grid - h), (0, tw * grid - w)),
                    mode="reflect")
    limit = max(clip_limit * th * tw, 1.0)
    cdfs = np.zeros((grid, grid, nbins))
    for ty in range(grid):
        for tx in range(grid):
            tile = bins_p[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
            hist = np.bincount(tile.reshape(-1), minlength=nbins).astype(
                np.float64)
            for _ in range(100):  # iterate redistribution to fixpoint
                excess = np.maximum(hist - limit, 0.0).sum()
                if excess < 1e-9:
                    break
                hist = np.minimum(hist, limit) + excess / nbins
            cdf = np.cumsum(hist)
            cdfs[ty, tx] = cdf / cdf[-1]
    out = np.zeros((h, w))
    for i in range(h):
        yy = (i + 0.5) / th - 0.5
        y0 = int(np.clip(np.floor(yy), 0, grid - 1))
        y1 = min(y0 + 1, grid - 1)
        fy = np.clip(yy - y0, 0.0, 1.0)
        for j in range(w):
            xx = (j + 0.5) / tw - 0.5
            x0 = int(np.clip(np.floor(xx), 0, grid - 1))
            x1 = min(x0 + 1, grid - 1)
            fx = np.clip(xx - x0, 0.0, 1.0)
            b = bins[i, j]
            top = cdfs[y0, x0, b] * (1 - fx) + cdfs[y0, x1, b] * fx
            bot = cdfs[y1, x0, b] * (1 - fx) + cdfs[y1, x1, b] * fx
            out[i, j] = top * (1 - fy) + bot * fy
    return out


def test_clahe_matches_numpy_twin(rng):
    """JAX CLAHE == the independent numpy twin of the published
    algorithm (iterative clip redistribution, kernel grid, bilinear
    tile blending), on a heavy-tailed field where single-pass
    redistribution would visibly diverge."""
    from caesar_yolo_tpu.ops.clahe import equalize_adapthist
    x = rng.normal(0, 1, (100, 90)).astype(np.float32)
    x[20:30, 40:50] += 50.0  # heavy tail -> clipped bins
    out = np.asarray(equalize_adapthist(x, clip_limit=0.02))
    ref = np_clahe_twin(x, clip_limit=0.02)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_clahe_clip_limits_contrast(rng):
    """Lower clip limit -> flatter mapping (contrast limiting works)."""
    from caesar_yolo_tpu.ops.clahe import equalize_adapthist
    x = rng.normal(0, 1, (64, 64)).astype(np.float32)
    hi = np.asarray(equalize_adapthist(x, clip_limit=1.0))
    lo = np.asarray(equalize_adapthist(x, clip_limit=0.005))
    # the low-clip output must be closer to the identity (normalized
    # input) mapping than the unclipped equalization
    norm = (x - x.min()) / (x.max() - x.min())
    assert np.abs(lo - norm).mean() < np.abs(hi - norm).mean()


def test_zscale_bright_source_keeps_noise_interval(rng):
    """A single ~1e7-count source atop unit noise must not trip the
    degenerate-fit guard: the legitimate few-unit zscale interval
    stands, instead of collapsing the stretch to the full min-max range
    (which would wash every faint source to zero contrast)."""
    import jax.numpy as jnp
    from caesar_yolo_tpu.ops.zscale import zscale_limits
    img = rng.normal(0.0, 1.0, (256, 256)).astype(np.float32)
    img[100, 100] = 1e7
    vmin, vmax = (float(a) for a in zscale_limits(jnp.asarray(img)))
    assert vmax > vmin
    assert vmax - vmin < 100.0, (vmin, vmax)


def test_zscale_flat_after_clip_falls_back_to_range(rng):
    """The guard's original purpose: a channel where >90% of pixels
    share one exact value fits a ~0 slope; the interval must fall back
    to the sample range rather than return vmin==vmax (the reference
    NaN-fills there, preprocessing.py:964-971)."""
    import jax.numpy as jnp
    from caesar_yolo_tpu.ops.zscale import zscale_limits
    img = np.full((128, 128), 5.0, np.float32)
    img[0, 0] = 10.0  # flat index 0 is always in the stride sample
    vmin, vmax = (float(a) for a in zscale_limits(jnp.asarray(img)))
    assert vmax > vmin
    np.testing.assert_allclose([vmin, vmax], [5.0, 10.0], rtol=1e-5)


def test_pipeline_call_routes_batch_path_on_tpu(rng, monkeypatch):
    """On TPU backends __call__ must take the compiled batch-of-one
    path (native histogram kernels; the per-image XLA formulation
    hangs real TPUs) and still match the per-image XLA chain."""
    import jax
    import jax.numpy as jnp

    pipe = T.build_preprocessor(zscale_stretch=True, normalize_minmax=True)
    img = jnp.asarray(rng.random((32, 32, 1)), jnp.float32)
    ref_out, ref_valid = pipe._run(img)  # the per-image XLA chain

    routed = []
    real_apply_one = pipe.apply_one
    monkeypatch.setattr(
        pipe, "apply_one",
        lambda im: routed.append(True) or real_apply_one(im))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    out, valid = pipe(img)
    assert routed, "__call__ on a TPU backend bypassed the batch path"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-6)
    assert bool(valid) == bool(ref_valid)


def test_pipeline_batch_portable_choice_is_cache_keyed(rng):
    """apply_one's native-vs-portable stage choice must enter the jit
    cache key: a TPU-mode trace must not be served from cache inside a
    later portable_suppression() export trace (or vice versa)."""
    import jax.numpy as jnp

    pipe = T.build_preprocessor(zscale_stretch=True, normalize_minmax=True)
    img = jnp.asarray(np.linspace(0, 1, 32 * 32, dtype=np.float32)
                      .reshape(32, 32, 1))
    out1, _ = pipe.apply_one(img)  # native=True trace
    from caesar_yolo_tpu.detect.nms import portable_suppression
    with portable_suppression():
        out2, _ = pipe.apply_one(img)  # must trace native=False fresh
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-6)


def test_ops_exports_every_transform_factory():
    """zscale_transformer was the one factory missing from the package
    exports; pin the whole documented set."""
    import caesar_yolo_tpu.ops as O

    for name in ("min_max_normalizer", "abs_min_max_normalizer",
                 "max_scaler", "abs_max_scaler", "chan_max_scaler",
                 "min_shifter", "shifter", "standardizer",
                 "negative_data_fixer", "scaler", "log_stretcher",
                 "border_masker", "bkg_subtractor", "sigma_clip_shifter",
                 "sigma_clipper", "resizer", "chan_divider",
                 "zscale_transformer", "hist_equalizer",
                 "chan3_transformer", "chan_resizer"):
        assert callable(getattr(O, name)), name
