"""Property tests for the 5-class synthetic morphology generator.

Pins the structural signatures that make each reference class learnable
(reference README.md:154-161) and the gt-box conventions the eval rules
depend on (make_prediction.py:328-547): flux inside the box, disjoint
islands for extended-multisland, ring (sign-changing) structure for
spurious, stripe elongation for flagged, and YOLO-format disk export.
"""

import numpy as np
import pytest

from caesar_yolo_tpu.utils.synth5 import (CLASS_NAMES, NATIVE_SIZE,
                                          make_multiclass_batch_np,
                                          make_multiclass_tile_fn,
                                          write_multiclass_dataset)


@pytest.fixture(scope="module")
def batch():
    return make_multiclass_batch_np(0, 96)


def _single_source_tiles(batch, cls=None):
    imgs, labels, boxes, mask = batch
    out = []
    for i in range(len(imgs)):
        if mask[i].sum() != 1:
            continue
        j = int(np.argmax(mask[i]))
        if cls is not None and labels[i, j] != cls:
            continue
        out.append((imgs[i, :, :, 0], int(labels[i, j]), boxes[i, j]))
    return out


def test_shapes_ranges_and_class_mix(batch):
    imgs, labels, boxes, mask = batch
    assert imgs.shape == (96, NATIVE_SIZE, NATIVE_SIZE, 3)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0 + 1e-6
    counts = np.bincount(labels[mask], minlength=5)
    assert (counts > 0).all(), counts  # every class appears
    # boxes inside the tile, non-degenerate where masked
    b = boxes[mask]
    assert (b[:, 0] < b[:, 2]).all() and (b[:, 1] < b[:, 3]).all()
    assert b.min() >= 0.0 and b.max() <= NATIVE_SIZE
    # some source-free tiles exist (noise rejection training signal)
    assert (mask.sum(1) == 0).any()


def test_flux_centroid_inside_box(batch):
    tiles = _single_source_tiles(batch)
    assert len(tiles) >= 5
    for im, cls, (x0, y0, x1, y1) in tiles:
        med = np.median(im)
        noise = np.std(np.concatenate([im[:10].ravel(), im[-10:].ravel()]))
        # noise-suppressed flux weighting: weak classes (spurious) would
        # otherwise centroid at the image center through the noise floor
        w = np.clip(im - med - 3.0 * noise, 0, None) ** 2
        assert w.sum() > 0, CLASS_NAMES[cls]
        yy, xx = np.mgrid[0:NATIVE_SIZE, 0:NATIVE_SIZE]
        cx = (w * xx).sum() / w.sum()
        cy = (w * yy).sum() / w.sum()
        assert x0 - 3 <= cx <= x1 + 3 and y0 - 3 <= cy <= y1 + 3, \
            (CLASS_NAMES[cls], cx, cy, (x0, y0, x1, y1))


def _count_islands(im, thr):
    """4-connected components above thr (tiny union-find, test-local)."""
    lab = np.zeros(im.shape, np.int32)
    cur = 0
    stack = []
    for sy, sx in zip(*np.where(im > thr)):
        if lab[sy, sx]:
            continue
        cur += 1
        stack.append((sy, sx))
        lab[sy, sx] = cur
        while stack:
            y, x = stack.pop()
            for ny, nx in ((y-1, x), (y+1, x), (y, x-1), (y, x+1)):
                if (0 <= ny < im.shape[0] and 0 <= nx < im.shape[1]
                        and not lab[ny, nx] and im[ny, nx] > thr):
                    lab[ny, nx] = cur
                    stack.append((ny, nx))
    sizes = np.bincount(lab.ravel())[1:]
    return int((sizes >= 3).sum())


def test_multisland_has_disjoint_islands(batch):
    tiles = _single_source_tiles(batch, cls=3)
    assert len(tiles) >= 1
    multi = 0
    for im, _, (x0, y0, x1, y1) in tiles:
        bg = np.median(im)
        crop = im[int(y0):int(np.ceil(y1)), int(x0):int(np.ceil(x1))]
        peak = crop.max() - bg
        n = _count_islands(crop - bg, 0.45 * peak)
        multi += n >= 2
    assert multi >= max(1, len(tiles) // 2), (multi, len(tiles))


def test_spurious_has_negative_ring(batch):
    """The sidelobe pattern must dip BELOW the noise floor around its
    peak — the signature that separates it from compact."""
    tiles = _single_source_tiles(batch, cls=0)
    assert len(tiles) >= 1
    for im, _, (x0, y0, x1, y1) in tiles:
        crop = im[int(y0):int(np.ceil(y1)), int(x0):int(np.ceil(x1))]
        med = np.median(im)
        noise = np.std(np.concatenate([im[:10].ravel(), im[-10:].ravel()]))
        assert crop.min() < med - 2.0 * noise


def test_flagged_is_bright_and_elongated(batch):
    tiles = _single_source_tiles(batch, cls=4)
    assert len(tiles) >= 1
    for im, _, box in tiles:
        med = np.median(im)
        noise = np.std(np.concatenate([im[:10].ravel(), im[-10:].ravel()]))
        x0, y0, x1, y1 = box
        crop = im[int(y0):int(np.ceil(y1)), int(x0):int(np.ceil(x1))]
        # bright core well above the compact amplitude band
        assert crop.max() - med > 8.0 * noise
        # stripe: the bright footprint is elongated — measure via the
        # second-moment (PCA) axis ratio, which is rotation-invariant
        # (axis-aligned extents fail for a diagonal stripe)
        ys, xs = np.where(crop - med > 1.5 * noise)
        pts = np.stack([xs - xs.mean(), ys - ys.mean()])
        cov = pts @ pts.T / len(xs)
        ev = np.sort(np.linalg.eigvalsh(cov))
        assert np.sqrt(ev[1] / max(ev[0], 1e-9)) >= 1.3, ev


def test_extended_larger_than_compact(batch):
    imgs, labels, boxes, mask = batch
    area = (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])
    a_compact = area[(labels == 1) & mask]
    a_ext = area[(labels == 2) & mask]
    assert a_ext.mean() > 2.0 * a_compact.mean()


def test_determinism_and_size_scaling():
    a = make_multiclass_batch_np(7, 4)
    b = make_multiclass_batch_np(7, 4)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # params scale with size: a 264px render has ~2x the box extents
    import jax
    make = make_multiclass_tile_fn(size=264)
    imgs, labels, boxes, mask = (np.asarray(v) for v in
                                 make(jax.random.PRNGKey(3), 16))
    w = (boxes[..., 2] - boxes[..., 0])[mask]
    w0 = (a[2][..., 2] - a[2][..., 0])[a[3]]
    assert 1.2 * w0.mean() < w.mean() < 4.0 * w0.mean()


def test_write_multiclass_dataset(tmp_path):
    from caesar_yolo_tpu.utils.fits import read_fits
    paths = write_multiclass_dataset(str(tmp_path), 6, seed=1)
    assert len(paths) == 6
    img, _, _ = read_fits(paths[0])
    assert img.shape == (NATIVE_SIZE, NATIVE_SIZE)
    yaml = (tmp_path / "dataset.yaml").read_text()
    for name in CLASS_NAMES:
        assert name in yaml
    # labels parse as YOLO rows with class ids 0..4
    rows = []
    for p in (tmp_path / "labels").iterdir():
        for line in p.read_text().splitlines():
            vals = line.split()
            assert len(vals) == 5
            assert 0 <= int(vals[0]) <= 4
            rows.append(vals)
    assert rows
