"""Pallas fused C2PSA attention: parity vs the XLA einsum path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caesar_yolo_tpu.models import pallas_attn
from caesar_yolo_tpu.models.layers import Attention


def einsum_attention(q, k, v, scale, dtype):
    """The pre-round-3 XLA formulation ([B,N,h,d] layout)."""
    attn = jnp.einsum("bnhk,bmhk->bhnm", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1).astype(dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                      preferred_element_type=jnp.float32).astype(dtype)


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-6),
                                        (jnp.bfloat16, 2e-2)])
@pytest.mark.parametrize("b,h,n,kd,hd", [(2, 4, 400, 32, 64),
                                         (1, 2, 64, 16, 32),
                                         (3, 1, 16, 32, 64)])
def test_attention_pallas_matches_einsum(rng, b, h, n, kd, hd, dtype,
                                         atol):
    q = jnp.asarray(rng.standard_normal((b, n, h, kd)), dtype)
    k = jnp.asarray(rng.standard_normal((b, n, h, kd)), dtype)
    v = jnp.asarray(rng.standard_normal((b, n, h, hd)), dtype)
    scale = kd ** -0.5
    ref = np.asarray(einsum_attention(q, k, v, scale, dtype), np.float32)
    got = pallas_attn.attention_pallas(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), scale).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(got, np.float32), ref,
                               atol=atol)


def test_attention_layer_pallas_vs_einsum_path(rng, monkeypatch):
    """Full Attention layer: the n%8==0 Pallas path equals the einsum
    fallback bit-for-bit in f32 op order (same cast sequence)."""
    attn = Attention(64, num_heads=2)
    params = attn.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.float32)
    assert pallas_attn.supported(64)
    out_pallas = np.asarray(attn(params, x))
    monkeypatch.setattr(pallas_attn, "supported", lambda n: False)
    out_einsum = np.asarray(attn(params, x))
    np.testing.assert_allclose(out_pallas, out_einsum, atol=2e-6)


def test_supported_gate():
    assert pallas_attn.supported(400)
    assert not pallas_attn.supported(36)   # 192px C2PSA grid
    assert not pallas_attn.supported(4)
