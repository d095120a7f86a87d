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
    monkeypatch.setattr(pallas_attn, "INTERPRET", True)  # CPU test env
    attn = Attention(64, num_heads=2)
    params = attn.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.float32)
    assert pallas_attn.supported(64)
    out_pallas = np.asarray(attn(params, x))
    monkeypatch.setattr(pallas_attn, "supported", lambda n: False)
    out_einsum = np.asarray(attn(params, x))
    np.testing.assert_allclose(out_pallas, out_einsum, atol=2e-6)


def test_supported_gate(monkeypatch):
    # CPU (this test env) without INTERPRET: models take the einsum
    # path — the Mosaic kernel only lowers on TPU, and the interpreter
    # is orders of magnitude too slow for a CPU hot path
    assert not pallas_attn.supported(400)
    monkeypatch.setattr(pallas_attn, "INTERPRET", True)
    assert pallas_attn.supported(400)
    assert not pallas_attn.supported(36)   # 192px C2PSA grid
    assert not pallas_attn.supported(4)
    # VMEM cap: huge-imgsize graphs must fall back to einsum rather
    # than blow the [N, N] VMEM score block (2560px -> n=6400)
    assert not pallas_attn.supported(6400)
    assert pallas_attn.supported(pallas_attn.MAX_N)


def test_attention_grad_matches_einsum(rng, monkeypatch):
    """Training goes through the kernel: the custom VJP's gradients
    must match differentiating the einsum formulation directly."""
    monkeypatch.setattr(pallas_attn, "INTERPRET", True)
    b, h, n, kd, hd = 1, 2, 16, 8, 16
    q = jnp.asarray(rng.standard_normal((b, h, n, kd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, kd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, hd)), jnp.float32)
    scale = kd ** -0.5
    w = jnp.asarray(rng.standard_normal((b, h, n, hd)), jnp.float32)

    def loss_pallas(q, k, v):
        return jnp.sum(pallas_attn.attention_pallas(q, k, v, scale) * w)

    def loss_ref(q, k, v):
        return jnp.sum(pallas_attn._attention_ref(q, k, v, scale) * w)

    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gp, gr in zip(g_pallas, g_ref):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   atol=1e-5, rtol=1e-5)


def test_yolo11_train_grad_through_attention(rng, monkeypatch):
    """jax.grad through a full yolo11 forward at an attention-supported
    grid (128px -> n=16): the regression that motivated the custom VJP
    — pallas_call has no transpose rule of its own."""
    monkeypatch.setattr(pallas_attn, "INTERPRET", True)
    from caesar_yolo_tpu.models.yolo import build_model, init_params
    model = build_model("yolo11n", num_classes=2)
    params = init_params(model, seed=0)
    assert pallas_attn.supported((128 // 32) ** 2)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 3)), jnp.float32)

    def loss(p):
        raw = model(p, x)
        return sum(jnp.sum(jnp.square(r)) for r in jax.tree_util
                   .tree_leaves(raw)) / 1e6

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert flat and all(np.isfinite(np.asarray(a)).all() for a in flat)
