"""Upsample formulations: all modes bit-exact vs jnp.repeat."""

import jax.numpy as jnp
import numpy as np
import pytest

from caesar_yolo_tpu.models import layers
from caesar_yolo_tpu.ops import pallas_upsample


@pytest.mark.parametrize("shape", [(2, 8, 8, 128), (1, 20, 20, 256)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_pallas_upsample_bit_exact(rng, monkeypatch, shape, dtype):
    monkeypatch.setattr(pallas_upsample, "INTERPRET", True)
    x = jnp.asarray(rng.standard_normal(shape), dtype)
    ref = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    got = pallas_upsample.upsample2x_pallas(x)
    assert got.dtype == x.dtype
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))


def test_upsample_layer_modes_match(rng, monkeypatch):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 128)), jnp.float32)
    up = layers.Upsample(2)
    # pin the reference to the repeat formulation regardless of any
    # ambient CY_UPSAMPLE (else the comparison can become a tautology)
    monkeypatch.setattr(layers, "_UPSAMPLE_MODE", "repeat")
    ref = np.asarray(up({}, x))
    monkeypatch.setattr(layers, "_UPSAMPLE_MODE", "broadcast")
    np.testing.assert_array_equal(np.asarray(up({}, x)), ref)
    monkeypatch.setattr(layers, "_UPSAMPLE_MODE", "pallas")
    monkeypatch.setattr(pallas_upsample, "INTERPRET", True)
    np.testing.assert_array_equal(np.asarray(up({}, x)), ref)
    # unsupported shape (C not 128-aligned) must fall back, not fail
    x2 = jnp.asarray(rng.standard_normal((1, 4, 4, 48)), jnp.float32)
    ref2 = jnp.repeat(jnp.repeat(x2, 2, axis=1), 2, axis=2)
    np.testing.assert_array_equal(np.asarray(up({}, x2)),
                                  np.asarray(ref2))


def test_upsample_mode_setter_validates(monkeypatch):
    # restore the ambient mode afterwards (it's session-global state
    # initialized from CY_UPSAMPLE)
    monkeypatch.setattr(layers, "_UPSAMPLE_MODE", layers._UPSAMPLE_MODE)
    with pytest.raises(AssertionError):
        layers.set_upsample_mode("nope")
    layers.set_upsample_mode("broadcast")
    assert layers._UPSAMPLE_MODE == "broadcast"
