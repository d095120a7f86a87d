"""Pallas fused attention for the YOLO11 C2PSA stage.

The XLA path (models/layers.Attention) materializes the [B, heads, N, N]
attention matrix in f32 HBM (327 MB/batch-128 at l-scale) and runs the
q.k / attn.v contractions as K=32 batched matmuls — measured 21 TFLOP/s
(11% of v5e bf16 peak) in the per-layer attribution, 8.5 ms of the
122 ms yolo11l batch (scripts/perf_attrib.py + flops_attrib.py, round
3).  This kernel fuses qk -> softmax -> av per (batch, head) with the
N x N matrix living only in VMEM (400 x 400 f32 = 640 KB), one HBM pass
over q/k/v.

Numerics match the einsum path op for op: scores f32 (MXU
preferred_element_type), max-subtracted softmax in f32, probabilities
cast back to the compute dtype BEFORE the v contraction, f32
accumulation, cast to the compute dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False  # tests flip this on CPU


def _use_interpret() -> bool:
    return INTERPRET or jax.default_backend() == "cpu"

# The [N, N] f32 score matrix plus softmax temporaries must stay inside
# the VMEM budget below (2 * N^2 * 4 B at the cap = 33 MB of the 64 MB
# limit, q/k/v blocks on top); larger imgsize graphs take the XLA
# einsum path, which compiles at any N.
MAX_N = 2048


def supported(n: int) -> bool:
    """Mosaic needs the position axis 8-aligned (sublane dim of the
    in-VMEM score matrix) and the score matrix must fit VMEM; other
    shapes take the XLA einsum path.  Only the TPU backend lowers the
    kernel (interpret mode is for parity tests, not the CPU hot path —
    models on CPU use the einsum path)."""
    from caesar_yolo_tpu.utils import portable
    import os as _os
    return (n % 8 == 0 and 8 <= n <= MAX_N
            and not portable.FORCE  # export tracing: einsum lowers anywhere
            # CY_ATTN=einsum: bench bisect hook (attribute rate deltas
            # to the fused C2PSA kernel vs the XLA einsum formulation)
            and _os.environ.get("CY_ATTN", "") != "einsum"
            and (jax.default_backend() in ("tpu", "axon") or INTERPRET))


def _attn_kernel(q_ref, k_ref, v_ref, out_ref, *, scale):
    q = q_ref[0, 0]                                   # [N, kd]
    k = k_ref[0, 0]
    v = v_ref[0, 0]                                   # [N, hd]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # [N, N] f32, VMEM
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _attention_ref(q, k, v, scale):
    """XLA einsum formulation with the SAME numerics as the kernel
    (f32 scores, max-subtracted softmax, compute-dtype probabilities,
    f32 accumulation).  Differentiable — the custom VJP below routes
    gradients through this."""
    s = jax.lax.dot_general(
        q, k, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32) * scale       # [B, H, N, N]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def _attention_fwd_pallas(q, k, v, scale):
    b, h, n, kd = q.shape
    hd = v.shape[-1]
    spec = lambda d: pl.BlockSpec((1, 1, n, d), lambda i, j: (i, j, 0, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(b, h),
        in_specs=[spec(kd), spec(kd), spec(hd)],
        out_specs=spec(hd),
        out_shape=jax.ShapeDtypeStruct((b, h, n, hd), v.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_use_interpret(),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention(q, k, v, scale):
    return _attention_fwd_pallas(q, k, v, scale)


def _attention_vjp_fwd(q, k, v, scale):
    # pallas_call has no differentiation rules, so training through the
    # C2PSA stage needs this custom VJP: the fused kernel runs forward,
    # the backward re-derives gradients through the numerically
    # identical einsum formulation (recompute-in-backward — the same
    # memory/time trade as jax.checkpoint, and the [N,N] scores still
    # never persist between passes)
    return _attention_fwd_pallas(q, k, v, scale), (q, k, v)


def _attention_vjp_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _attention_ref(q_, k_, v_, scale),
                     q, k, v)
    return vjp(g)


_attention.defvjp(_attention_vjp_fwd, _attention_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("scale",))
def attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     scale: float) -> jnp.ndarray:
    """q, k [B, H, N, kd]; v [B, H, N, hd] -> [B, H, N, hd].

    softmax(q k^T * scale) v with the score matrix VMEM-resident.
    Differentiable (custom VJP through the einsum formulation)."""
    return _attention(q, k, v, scale)
