"""Synthetic radio-mosaic generation (testing / benchmarking).

Builds FITS mosaics with Gaussian noise plus injected elliptical-Gaussian
point/extended sources and returns their ground-truth boxes — the
framework's stand-in for real survey cutouts when exercising the tiled
pipeline end-to-end (the reference ships one real 132x132 cutout and a
git-LFS mosaic that is absent from its snapshot, SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np

from caesar_yolo_tpu.utils.fits import FitsHeader, write_fits


def make_mosaic(nx: int = 1024, ny: int = 1024, n_sources: int = 40,
                noise_sigma: float = 0.1, seed: int = 0,
                amp_range=(1.0, 10.0), sigma_range=(1.5, 6.0)):
    """-> (image[ny, nx] float32, gt_boxes[N, 4] xyxy).

    Sources are elliptical Gaussians; each gt box is the 2-sigma extent.
    """
    rng = np.random.default_rng(seed)
    img = rng.normal(0.0, noise_sigma, (ny, nx)).astype(np.float32)
    boxes = []
    for _ in range(n_sources):
        cx = rng.uniform(10, nx - 10)
        cy = rng.uniform(10, ny - 10)
        sx = rng.uniform(*sigma_range)
        sy = rng.uniform(*sigma_range)
        amp = rng.uniform(*amp_range)
        # add within a local window only (cheap) — windowed aranges, not
        # a full-image mgrid (which would cost 2 x 8 bytes/pixel: 4 GB
        # of index arrays for a 16k x 16k production-scale mosaic)
        x0, x1 = int(max(0, cx - 4 * sx)), int(min(nx, cx + 4 * sx + 1))
        y0, y1 = int(max(0, cy - 4 * sy)), int(min(ny, cy + 4 * sy + 1))
        wy = np.arange(y0, y1)[:, None]
        wx = np.arange(x0, x1)[None, :]
        img[y0:y1, x0:x1] += amp * np.exp(
            -((wx - cx) ** 2 / (2 * sx ** 2)
              + (wy - cy) ** 2 / (2 * sy ** 2))).astype(np.float32)
        boxes.append([cx - 2 * sx, cy - 2 * sy, cx + 2 * sx, cy + 2 * sy])
    return img, np.asarray(boxes, np.float32)


def write_mosaic_fits(path: str, nx: int = 1024, ny: int = 1024,
                      **kwargs):
    """Write a synthetic mosaic FITS with beam keywords; returns gt boxes."""
    img, boxes = make_mosaic(nx=nx, ny=ny, **kwargs)
    header = FitsHeader()
    header["CDELT1"] = -2.777778e-4
    header["CDELT2"] = 2.777778e-4
    header["BMAJ"] = 2.5e-3
    header["BMIN"] = 2.0e-3
    header["BPA"] = 10.0
    header["BUNIT"] = "JY/BEAM"
    write_fits(img, path, header)
    return boxes
