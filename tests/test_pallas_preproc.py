"""Pallas fused preprocessing kernel: parity vs the reference transforms
(interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

import caesar_yolo_tpu.ops.pallas_preproc as pk
from caesar_yolo_tpu.ops import build_preprocessor


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pk, "INTERPRET", True)


def test_fused_matches_pipeline(rng):
    tiles = rng.random((3, 48, 48, 1), dtype=np.float32) + 0.1
    tiles[:, 4:9, 6:12] = 0.0  # masked pixels
    pipe = build_preprocessor(zscale_stretch=True, normalize_minmax=True)
    ref = np.stack([np.asarray(pipe(t)[0]) for t in tiles])
    out, valid = pk.fused_zscale_minmax(jnp.asarray(tiles))
    assert np.asarray(valid).all()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_fused_norm_range(rng):
    tiles = rng.random((2, 32, 32), dtype=np.float32)
    out, valid = pk.fused_zscale_minmax(jnp.asarray(tiles),
                                        norm_min=0.0, norm_max=255.0)
    out = np.asarray(out)
    assert np.asarray(valid).all()
    m = out != 0
    assert out[m].max() == pytest.approx(255.0, rel=1e-5)
    assert out.min() >= 0.0


def test_fused_degenerate_tile_invalid():
    tiles = np.zeros((2, 32, 32), np.float32)
    tiles[0] = np.random.default_rng(0).random((32, 32))
    out, valid = pk.fused_zscale_minmax(jnp.asarray(tiles))
    assert np.asarray(valid).tolist() == [True, False]
