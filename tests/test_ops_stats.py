"""Statistical kernels vs independent numpy reimplementations."""

import numpy as np
import pytest

from caesar_yolo_tpu.ops import histeq, stats, zscale


# Independent numpy port of astropy sigma-clipping semantics
# (cenfunc=median, stdfunc=std ddof=0, bounds inclusive, maxiters)
def np_sigma_clipped(data, sigma_low, sigma_up, maxiters=5):
    d = np.asarray(data, dtype=np.float64).ravel()
    lower, upper = -np.inf, np.inf
    for _ in range(maxiters):
        med = np.median(d)
        std = d.std()
        lower = med - sigma_low * std
        upper = med + sigma_up * std
        nd = d[(d >= lower) & (d <= upper)]
        if nd.size == d.size:
            break
        d = nd
    return d.mean(), np.median(d), d.std(), lower, upper


@pytest.mark.parametrize("sigma", [1.0, 2.5, 3.0])
def test_sigma_clipped_stats_gaussian_with_outliers(rng, sigma):
    x = rng.normal(0.0, 1.0, 4096).astype(np.float32)
    x[:50] += 50.0  # outliers
    mask = np.ones_like(x, dtype=bool)
    mean, med, std, lo, up, n = stats.sigma_clipped_stats(x, mask, sigma, sigma)
    rmean, rmed, rstd, rlo, rup = np_sigma_clipped(x, sigma, sigma)
    assert float(mean) == pytest.approx(rmean, abs=5e-3)
    assert float(med) == pytest.approx(rmed, abs=5e-3)
    assert float(std) == pytest.approx(rstd, rel=5e-3)
    assert float(lo) == pytest.approx(rlo, abs=2e-2)
    assert float(up) == pytest.approx(rup, abs=2e-2)
    assert int(n) == 4096


def test_sigma_clipped_stats_asymmetric(rng):
    x = rng.normal(5.0, 2.0, 2048).astype(np.float32)
    x[:30] -= 100.0
    mask = np.ones_like(x, dtype=bool)
    _, med, std, lo, up, _ = stats.sigma_clipped_stats(x, mask, 1.0, 8.0)
    rmean, rmed, rstd, rlo, rup = np_sigma_clipped(x, 1.0, 8.0)
    assert float(med) == pytest.approx(rmed, abs=2e-2)
    assert float(lo) == pytest.approx(rlo, rel=2e-2)
    assert float(up) == pytest.approx(rup, rel=2e-2)


def test_sigma_clipped_stats_respects_mask(rng):
    x = rng.normal(0.0, 1.0, 1024).astype(np.float32)
    mask = np.ones_like(x, dtype=bool)
    # poison masked-out entries; stats must not move
    x2 = x.copy()
    x2[::7] = 1e9
    mask2 = mask.copy()
    mask2[::7] = False
    a = stats.sigma_clipped_stats(x[mask2], np.ones(mask2.sum(), bool), 3.0, 3.0)
    b = stats.sigma_clipped_stats(x2, mask2, 3.0, 3.0)
    assert float(a[0]) == pytest.approx(float(b[0]), abs=1e-5)
    assert float(a[2]) == pytest.approx(float(b[2]), abs=1e-5)


def test_sigma_clipped_stats_empty_mask():
    x = np.zeros(64, np.float32)
    mean, med, std, _, _, n = stats.sigma_clipped_stats(
        x, np.zeros(64, bool), 3.0, 3.0)
    assert int(n) == 0
    assert np.isnan(float(mean))


def test_sigma_clipped_stats_constant():
    x = np.full(256, 7.5, np.float32)
    mean, med, std, lo, up, n = stats.sigma_clipped_stats(
        x, np.ones(256, bool), 3.0, 3.0)
    assert float(mean) == pytest.approx(7.5)
    assert float(std) == 0.0
    assert int(n) == 256


# ---------------- zscale ----------------

def np_zscale_limits(values, contrast=0.25, nsamples=1000, max_reject=0.5,
                     min_npixels=5, krej=2.5, max_iterations=5):
    """Independent numpy port of the IRAF/astropy zscale algorithm."""
    values = np.asarray(values, dtype=np.float64).ravel()
    values = values[np.isfinite(values)]
    stride = int(max(1.0, values.size / nsamples))
    v = np.sort(values[::stride][:nsamples])
    npix = v.size
    vmin, vmax = v[0], v[-1]
    minpix = max(min_npixels, int(npix * max_reject))
    x = np.arange(npix)
    ngood, last = npix, npix + 1
    bad = np.zeros(npix, bool)
    ngrow = max(1, int(npix * 0.01))
    kernel = np.ones(ngrow, bool)
    slope = 0.0
    for _ in range(max_iterations):
        if ngood >= last or ngood < minpix:
            break
        fit = np.polyfit(x, v, deg=1, w=(~bad).astype(int))
        fitted = np.polyval(fit, x)
        flat = v - fitted
        thr = krej * flat[~bad].std()
        bad[(flat < -thr) | (flat > thr)] = True
        bad = np.convolve(bad, kernel, mode="same")
        last, ngood = ngood, np.sum(~bad)
        slope = fit[0]
    if ngood >= minpix:
        if contrast > 0:
            slope = slope / contrast
        center = (npix - 1) // 2
        med = np.median(v)
        vmin = max(vmin, med - (center - 1) * slope)
        vmax = min(vmax, med + (npix - center) * slope)
    return vmin, vmax


@pytest.mark.parametrize("contrast", [0.25, 0.5])
def test_zscale_limits_vs_numpy(rng, contrast):
    img = rng.normal(10.0, 2.0, (132, 132)).astype(np.float32)
    img[40:50, 40:50] += 100.0  # a bright source
    z1, z2 = zscale.zscale_limits(img, contrast=contrast)
    r1, r2 = np_zscale_limits(img, contrast=contrast)
    span = r2 - r1
    assert float(z1) == pytest.approx(r1, abs=2e-3 * span)
    assert float(z2) == pytest.approx(r2, abs=2e-3 * span)


def test_zscale_limits_small_image(rng):
    img = rng.normal(0.0, 1.0, (24, 24)).astype(np.float32)
    z1, z2 = zscale.zscale_limits(img)
    r1, r2 = np_zscale_limits(img)
    span = r2 - r1
    assert float(z1) == pytest.approx(r1, abs=5e-3 * span)
    assert float(z2) == pytest.approx(r2, abs=5e-3 * span)


def test_zscale_transform_range(rng):
    img = rng.normal(0.0, 1.0, (64, 64)).astype(np.float32)
    out = np.asarray(zscale.zscale_transform(img))
    assert out.min() >= 0.0 and out.max() <= 1.0
    # monotone: higher input -> >= output
    flat_in = img.ravel()
    flat_out = out.ravel()
    order = np.argsort(flat_in)
    assert np.all(np.diff(flat_out[order]) >= -1e-6)


def test_zscale_constant_image():
    img = np.full((32, 32), 3.0, np.float32)
    z1, z2 = zscale.zscale_limits(img)
    assert float(z1) == float(z2) == 3.0
    out = np.asarray(zscale.zscale_transform(img))
    assert np.all(out == 0.0)


# ---------------- histogram equalization ----------------

def np_equalize_hist(image, nbins=256):
    """skimage.exposure.equalize_hist semantics for float images."""
    flat = np.asarray(image, dtype=np.float64).ravel()
    hist, edges = np.histogram(flat, bins=nbins)
    centers = (edges[:-1] + edges[1:]) / 2
    cdf = hist.cumsum().astype(np.float64)
    cdf /= cdf[-1]
    return np.interp(flat, centers, cdf).reshape(image.shape)


def test_equalize_hist_vs_numpy(rng):
    img = rng.gamma(2.0, 1.0, (100, 80)).astype(np.float32)
    out = np.asarray(histeq.equalize_hist(img))
    ref = np_equalize_hist(img)
    assert np.abs(out - ref).max() < 5e-3
    assert out.min() >= 0 and out.max() <= 1.0001


def test_equalize_hist_uniform_output(rng):
    img = rng.normal(0, 1, (128, 128)).astype(np.float32)
    out = np.asarray(histeq.equalize_hist(img))
    # Equalized histogram should be ~flat: CDF close to identity
    qs = np.percentile(out, [10, 30, 50, 70, 90])
    np.testing.assert_allclose(qs, [0.1, 0.3, 0.5, 0.7, 0.9], atol=0.02)
