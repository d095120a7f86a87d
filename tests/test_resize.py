"""Resize helper tests (reference utils.py:435-620 semantics)."""

import numpy as np
import pytest

from caesar_yolo_tpu.utils.resize import resize_img, resize_img_v2, resize_mask


def test_resize_img_shapes_and_range():
    img = np.random.default_rng(0).random((40, 60, 3), np.float32)
    out = resize_img(img, (80, 120))
    assert out.shape == (80, 120, 3)
    assert out.min() >= img.min() - 1e-6 and out.max() <= img.max() + 1e-6
    # identity
    same = resize_img(img, (40, 60))
    np.testing.assert_array_equal(same, img)


def test_resize_img_nearest_preserves_values():
    mask = (np.arange(16).reshape(4, 4) % 3).astype(np.uint8)
    out = resize_img(mask, (8, 8), order=0)
    assert set(np.unique(out)) <= set(np.unique(mask))


def test_resize_v2_square_window_and_padding():
    img = np.ones((50, 100), np.float32)
    out, window, scale, padding, crop = resize_img_v2(
        img, min_dim=64, max_dim=128, mode="square")
    assert out.shape == (128, 128)
    assert scale == pytest.approx(1.28)
    y1, x1, y2, x2 = window
    assert (x1, x2) == (0, 128)
    assert y2 - y1 == 64
    assert crop is None
    # padded area is zero, image area is ~1
    assert out[:y1].sum() == 0
    assert out[y1:y2].mean() == pytest.approx(1.0, rel=1e-5)


def test_resize_v2_none():
    img = np.ones((10, 12), np.float32)
    out, window, scale, padding, crop = resize_img_v2(img, mode="none")
    assert out.shape == (10, 12) and scale == 1 and window == (0, 0, 10, 12)


def test_resize_v2_pad64():
    img = np.ones((100, 130, 3), np.float32)
    out, window, scale, padding, crop = resize_img_v2(img, mode="pad64")
    assert out.shape[0] % 64 == 0 and out.shape[1] % 64 == 0
    assert out.shape == (128, 192, 3)
    y1, x1, y2, x2 = window
    assert (y2 - y1, x2 - x1) == (100, 130)


def test_resize_v2_crop_reproducible():
    img = np.arange(100 * 100, dtype=np.float32).reshape(100, 100)
    rng = np.random.default_rng(7)
    out, window, scale, padding, crop = resize_img_v2(
        img, min_dim=64, mode="crop", rng=rng)
    assert out.shape == (64, 64)
    y, x, ch, cw = crop
    np.testing.assert_array_equal(out, img[y:y + 64, x:x + 64])


def test_resize_v2_invalid_mode_and_ndims():
    assert resize_img_v2(np.ones((4, 4)), mode="bogus") is None
    assert resize_img_v2(np.ones((4, 4, 3, 1)), mode="square",
                         max_dim=8) is None


def test_resize_mask_roundtrip():
    mask = np.zeros((50, 100), np.uint8)
    mask[10:20, 30:60] = 1
    img = np.ones((50, 100), np.float32)
    _, window, scale, padding, crop = resize_img_v2(
        img, min_dim=64, max_dim=128, mode="square")
    out = resize_mask(mask, scale, padding, crop)
    assert out.shape == (128, 128)
    assert set(np.unique(out)) <= {0, 1}
    assert out.sum() > 0


def test_resize_v2_square_requires_max_dim():
    """mode='square' without max_dim must log-and-return None (the
    documented invalid-input contract), not crash with TypeError."""
    import numpy as np
    from caesar_yolo_tpu.utils.resize import resize_img_v2
    assert resize_img_v2(np.zeros((8, 8), np.float32), min_dim=16) is None
