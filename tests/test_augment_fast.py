"""Fast batched augmentation resampler (rot90 + shear/scale multipass):
parity vs the single-pass gather sampler, exactness at 90-degree
multiples, shared box math, and the Pallas shear kernel contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caesar_yolo_tpu.train.augment import (_affine_sample, _rot_scale_mats,
                                           _rot_scale_sample_batch,
                                           augment_batch, augment_sample)


@pytest.fixture
def smooth_img():
    S = 96
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32)
    img = np.exp(-((xx - 30) ** 2 + (yy - 60) ** 2) / (2 * 12 ** 2))
    img += 0.3 * np.exp(-((xx - 70) ** 2 + (yy - 25) ** 2) / 50.0)
    return jnp.asarray(img[..., None])


def _ref(img, deg, s):
    S = img.shape[0]
    _, inv = _rot_scale_mats(jnp.float32(np.radians(deg)), jnp.float32(s),
                             (S - 1) / 2, (S - 1) / 2)
    return _affine_sample(img, inv)


def test_exact_at_90_multiples(smooth_img):
    for deg in (0.0, 90.0, 180.0, -90.0):
        for s in (0.7, 1.0, 1.3):
            ref = _ref(smooth_img, deg, s)
            got = _rot_scale_sample_batch(
                smooth_img[None], jnp.asarray([np.radians(deg)], jnp.float32),
                jnp.asarray([s], jnp.float32))[0]
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-5,
                                       err_msg=f"deg={deg} s={s}")


def test_close_at_arbitrary_angles(smooth_img):
    """Multipass interpolation differs from one-pass bilinear only at
    the interpolation-scheme level (~1% of value range on smooth data)."""
    for deg in (15.0, 45.0, 60.0, 135.0, -30.0, -170.0):
        for s in (0.7, 1.0, 1.3):
            ref = np.asarray(_ref(smooth_img, deg, s))
            got = np.asarray(_rot_scale_sample_batch(
                smooth_img[None], jnp.asarray([np.radians(deg)], jnp.float32),
                jnp.asarray([s], jnp.float32))[0])
            assert np.abs(got - ref).max() < 0.02, f"deg={deg} s={s}"
            assert np.abs(got - ref).mean() < 1e-3


def test_augment_batch_boxes_match_reference(rng):
    """The fast path consumes randomness identically to augment_sample,
    so boxes/masks/flips are bit-identical — only pixels differ by the
    resampling scheme."""
    B, S, M = 4, 64, 3
    imgs = jnp.asarray(rng.random((B, S, S, 3), np.float32))
    boxes = jnp.asarray(rng.random((B, M, 4)) * 40 + 5, jnp.float32)
    boxes = jnp.concatenate([boxes[..., :2], boxes[..., :2] + 12.0], -1)
    masks = jnp.ones((B, M), bool)
    key = jax.random.PRNGKey(3)

    fast_imgs, fast_boxes, fast_masks = augment_batch(key, imgs, boxes, masks)
    keys = jax.random.split(key, B)
    ref = jax.vmap(lambda k, i, b, m: augment_sample(k, i, b, m))(
        keys, imgs, boxes, masks)
    np.testing.assert_allclose(np.asarray(fast_boxes), np.asarray(ref[1]),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(fast_masks), np.asarray(ref[2]))
    assert fast_imgs.shape == ref[0].shape


def test_nonsquare_falls_back(rng):
    imgs = jnp.asarray(rng.random((2, 32, 48, 3), np.float32))
    boxes = jnp.zeros((2, 2, 4), jnp.float32)
    masks = jnp.zeros((2, 2), bool)
    out, b, m = augment_batch(jax.random.PRNGKey(0), imgs, boxes, masks)
    assert out.shape == imgs.shape


def test_pallas_shear_kernel_matches_fallback(rng, monkeypatch):
    """The Pallas lane-roll kernel (interpret mode) is exact vs the
    dynamic-slice fallback used off-TPU."""
    import caesar_yolo_tpu.ops.pallas_shift as ps
    from caesar_yolo_tpu.train.augment import _row_shift_batch

    monkeypatch.setattr(ps, "INTERPRET", True)
    imgs = jnp.asarray(rng.random((2, 24, 40, 3), np.float32))
    shifts = jnp.asarray(rng.uniform(-9, 9, (2, 24)), jnp.float32)
    ref = _row_shift_batch(imgs, shifts, 12, 0.0)        # cpu fallback
    got = ps.fractional_row_shift_batch(imgs, shifts, 12, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_gray_fill_parity_both_paths(smooth_img):
    """With the letterbox-gray fill (the training default), the fast
    multipass resampler must agree with the one-pass reference: exact
    at 90-degree multiples (incl. the scale einsums' coverage top-up,
    which replaces their implicit zero fill), interpolation-level
    elsewhere — and out-of-frame corners must BE the gray, not 0."""
    from caesar_yolo_tpu.detect.letterbox import PAD_VALUE

    def ref(img, deg, s):
        S = img.shape[0]
        _, inv = _rot_scale_mats(jnp.float32(np.radians(deg)),
                                 jnp.float32(s), (S - 1) / 2, (S - 1) / 2)
        return _affine_sample(img, inv, pad_val=PAD_VALUE)

    for deg, s, atol in ((180.0, 0.6, 1e-5), (90.0, 0.5, 1e-5)):
        r = np.asarray(ref(smooth_img, deg, s))
        g = np.asarray(_rot_scale_sample_batch(
            smooth_img[None], jnp.asarray([np.radians(deg)], jnp.float32),
            jnp.asarray([s], jnp.float32), pad_val=PAD_VALUE)[0])
        assert np.abs(g - r).max() < atol, (deg, s)
    # arbitrary angle: the content/fill frontier (the rotated frame
    # edge, a diagonal through the output) blends differently through
    # the multipass shears than through one-pass bilinear; away from
    # that ~2px ring the two must agree at interpolation level
    S = smooth_img.shape[0]
    _, inv = _rot_scale_mats(jnp.float32(np.radians(45.0)),
                             jnp.float32(1.0), (S - 1) / 2, (S - 1) / 2)
    r = np.asarray(ref(smooth_img, 45.0, 1.0))
    g = np.asarray(_rot_scale_sample_batch(
        smooth_img[None], jnp.asarray([np.radians(45.0)], jnp.float32),
        jnp.asarray([1.0], jnp.float32), pad_val=PAD_VALUE)[0])
    cov = np.asarray(_affine_sample(jnp.ones_like(smooth_img), inv,
                                    pad_val=0.0))[..., 0]
    frontier = (cov > 1e-6) & (cov < 1 - 1e-6)
    for dy in (-2, -1, 0, 1, 2):          # dilate the frontier by 2px
        for dx in (-2, -1, 0, 1, 2):
            frontier |= np.roll(np.roll(frontier, dy, 0), dx, 1)
    d = np.abs(g - r)[..., 0]
    assert d.mean() < 3e-3
    assert d[~frontier].max() < 0.03
    # zoomed out far: corners are pure out-of-frame fill
    g = np.asarray(_rot_scale_sample_batch(
        smooth_img[None], jnp.asarray([0.0], jnp.float32),
        jnp.asarray([0.3], jnp.float32), pad_val=PAD_VALUE)[0])
    assert abs(g[0, 0, 0] - PAD_VALUE) < 1e-5
    assert abs(g[-1, -1, 0] - PAD_VALUE) < 1e-5
