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


def test_fused_out_dtype_bf16():
    """out_dtype casts in-kernel; math stays f32 (values match the f32
    output rounded to bf16)."""
    tiles = np.random.default_rng(1).random((2, 32, 32)).astype(np.float32)
    f32, v32 = pk.fused_zscale_minmax(jnp.asarray(tiles))
    bf16, v16 = pk.fused_zscale_minmax(jnp.asarray(tiles),
                                       out_dtype=jnp.bfloat16)
    assert bf16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(v32), np.asarray(v16))
    np.testing.assert_array_equal(
        np.asarray(bf16), np.asarray(f32.astype(jnp.bfloat16)))


def test_build_preprocessor_attaches_fused():
    """The README-default pattern gets the fused TPU path; patterns the
    kernel does not implement must not."""
    pipe = build_preprocessor(zscale_stretch=True, normalize_minmax=True)
    assert pipe.fused_batch is not None
    pipe2 = build_preprocessor(zscale_stretch=True, normalize_minmax=True,
                               clip_data=True)
    assert pipe2.fused_batch is None


def test_apply_batch_fused_matches_generic(rng):
    """apply_batch(use_fused=True): the opt-in Pallas kernel (interpret
    mode) agrees with the default XLA-fused chain."""
    import jax

    tiles = rng.random((3, 32, 32, 1), dtype=np.float32) + 0.05
    tiles[1, 2:6, 3:9] = 0.0
    pipe = build_preprocessor(zscale_stretch=True, normalize_minmax=True)
    ref, ok_ref = jax.vmap(pipe.apply)(jnp.asarray(tiles))
    out, ok = pipe.apply_batch(jnp.asarray(tiles), use_fused=True)
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_ref))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
