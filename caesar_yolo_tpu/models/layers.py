"""Functional YOLO building blocks in JAX (NHWC, TPU-native).

Blocks are small Python objects carrying static configuration; parameters
live in plain nested-dict pytrees.  Compute conventions:

  - NHWC activations / HWIO kernels (TPU-preferred layouts)
  - explicit symmetric padding k//2 (bit-matches torch Conv2d padding=k//2;
    XLA 'SAME' picks asymmetric pads at stride 2 and would shift the grid)
  - BatchNorm eps=1e-3 (ultralytics nn.BatchNorm2d(c, eps=0.001))
  - optional bfloat16 activations with float32 accumulation on the MXU
  - `fuse=True` params fold BN into conv weight+bias for inference

The block zoo covers YOLOv8 (Conv, Bottleneck, C2f, SPPF) and YOLO11
(C3k, C3k2, C2PSA attention); behavioral reference: the ultralytics
modules the reference drives through `model()` (reference
evaluation.py:181-193) — re-derived here from the published architecture,
not ported.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from jax import lax

BN_EPS = 1e-3

# Train-mode context: inside `train_mode()`, BatchNorm normalizes with the
# CURRENT BATCH statistics (torch training semantics) instead of the
# stored running stats, optionally recording per-layer batch stats (keyed
# by id of the bn params dict) for post-training calibration ("precise
# BN": re-estimate running stats over k batches after training, instead
# of threading mutable running-average state through the jitted step).
_TRAIN_MODE = False
_BN_STATS: dict | None = None

# PTQ calibration context: inside `quant_calibrate()`, every Conv call
# (eager, not traced) records the running max|input| keyed by id(module)
# — the same instance-keyed convention as the precise-BN collector.
_QUANT_CALIB: dict | None = None


class quant_calibrate:
    """Context manager collecting per-Conv activation ranges for PTQ.

    Run eager (un-jitted) forwards inside; the dict maps id(conv_module)
    -> max|x| seen.  models/quant.py turns these into int8 input scales.
    """

    def __init__(self, collect: dict | None = None):
        self.collect = collect if collect is not None else {}

    def __enter__(self):
        global _QUANT_CALIB
        self._prev = _QUANT_CALIB
        _QUANT_CALIB = self.collect
        return self.collect

    def __exit__(self, *exc):
        global _QUANT_CALIB
        _QUANT_CALIB = self._prev
        return False


class train_mode:
    """Context manager enabling batch-stat BatchNorm for model calls
    traced within; pass a dict to also collect {id(bn): (mean, var)}."""

    def __init__(self, collect: dict | None = None):
        self.collect = collect

    def __enter__(self):
        global _TRAIN_MODE, _BN_STATS
        self._prev = (_TRAIN_MODE, _BN_STATS)
        _TRAIN_MODE, _BN_STATS = True, self.collect
        return self.collect

    def __exit__(self, *exc):
        global _TRAIN_MODE, _BN_STATS
        _TRAIN_MODE, _BN_STATS = self._prev
        return False


def make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(x + divisor / 2) // divisor * divisor)


def silu(x):
    return x * jax.nn.sigmoid(x)


def _conv2d(x, w, stride: int, pad: int, groups: int = 1,
            acc_type=jnp.float32):
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=acc_type,
    )


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


class Conv:
    """Conv2d + BatchNorm + SiLU (ultralytics Conv block)."""

    def __init__(self, cin: int, cout: int, k: int = 1, s: int = 1,
                 groups: int = 1, act: bool = True):
        self.cin, self.cout, self.k, self.s = cin, cout, k, s
        self.groups, self.act = groups, act
        self.pad = k // 2

    def init(self, key):
        # torch Conv2d default kaiming_uniform(a=sqrt(5)) ~ U(+-1/sqrt(fan_in))
        fan_in = self.cin // self.groups * self.k * self.k
        bound = 1.0 / math.sqrt(fan_in)
        w = _uniform(key, (self.k, self.k, self.cin // self.groups, self.cout),
                     bound)
        return {
            "w": w,
            "bn": {
                "gamma": jnp.ones((self.cout,), jnp.float32),
                "beta": jnp.zeros((self.cout,), jnp.float32),
                "mean": jnp.zeros((self.cout,), jnp.float32),
                "var": jnp.ones((self.cout,), jnp.float32),
            },
        }

    def __call__(self, params, x):
        dtype = x.dtype
        if "wq" in params:
            # int8 PTQ path (models/quant.py): symmetric per-tensor input
            # scale, per-cout weight scale; s8 x s8 -> s32 on the MXU,
            # dequant + bias + SiLU fused into the epilogue by XLA.
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / params["xs"]),
                          -127, 127).astype(jnp.int8)
            y = _conv2d(xq, params["wq"], self.s, self.pad, self.groups,
                        acc_type=jnp.int32)
            y = (y.astype(jnp.float32) * (params["ws"] * params["xs"])
                 + params["b"]).astype(dtype)
            return silu(y) if self.act else y
        if _QUANT_CALIB is not None:
            amax = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
            _QUANT_CALIB[id(self)] = max(_QUANT_CALIB.get(id(self), 0.0),
                                         amax)
        # Training in bf16: emit the conv result in the compute dtype
        # instead of preferred f32 — the MXU still accumulates partial
        # products in f32 internally, and a mixed-dtype (f32 cotangent x
        # bf16 operand) transpose conv is not differentiable-lowerable.
        # Inference keeps the f32 output for bit-stable BN/epilogue math.
        acc = dtype if (_TRAIN_MODE and dtype == jnp.bfloat16) \
            else jnp.float32
        # 3x3 depthwise stages (v11 head cls branch, C2PSA positional
        # encoding) stay on XLA's grouped conv: it runs ~4.7x above the
        # HBM read+write floor, but both VPU reformulations measured
        # SLOWER on-chip (shift9 ~2x, VMEM-resident Pallas ~1.9x — the
        # sublane-dim shift concats are relayout-bound; see
        # scripts/probe_dwconv.py, 2026-08-19)
        y = _conv2d(x, params["w"].astype(dtype), self.s, self.pad,
                    self.groups, acc_type=acc)
        if "bn" in params:
            bn = params["bn"]
            if _TRAIN_MODE:
                yf = y.astype(jnp.float32)
                mean = yf.mean(axis=(0, 1, 2))
                var = yf.var(axis=(0, 1, 2))
                if _BN_STATS is not None:
                    _BN_STATS[id(bn)] = (mean, var)
            else:
                mean, var = bn["mean"], bn["var"]
            scale = bn["gamma"] / jnp.sqrt(var + BN_EPS)
            bias = bn["beta"] - mean * scale
            y = y * scale + bias
        elif "b" in params:
            y = y + params["b"]
        y = y.astype(dtype)
        return silu(y) if self.act else y

    def fuse(self, params):
        """Fold BN into conv weight + bias (inference fast path)."""
        if "bn" not in params:
            return params
        bn = params["bn"]
        scale = bn["gamma"] / jnp.sqrt(bn["var"] + BN_EPS)
        return {"w": params["w"] * scale[None, None, None, :],
                "b": bn["beta"] - bn["mean"] * scale}


class Conv2dRaw:
    """Bare Conv2d with bias, no BN/activation (detect head final 1x1s)."""

    def __init__(self, cin: int, cout: int, k: int = 1):
        self.cin, self.cout, self.k = cin, cout, k
        self.pad = k // 2

    def init(self, key):
        fan_in = self.cin * self.k * self.k
        bound = 1.0 / math.sqrt(fan_in)
        k1, k2 = jax.random.split(key)
        return {"w": _uniform(k1, (self.k, self.k, self.cin, self.cout), bound),
                "b": _uniform(k2, (self.cout,), bound)}

    def __call__(self, params, x):
        dtype = x.dtype
        acc = dtype if (_TRAIN_MODE and dtype == jnp.bfloat16) \
            else jnp.float32
        y = _conv2d(x, params["w"].astype(dtype), 1, self.pad, acc_type=acc)
        return (y + params["b"].astype(y.dtype)).astype(dtype)


class Bottleneck:
    """Two convs with optional residual (ultralytics Bottleneck)."""

    def __init__(self, cin: int, cout: int, shortcut: bool = True,
                 groups: int = 1, k: tuple = (3, 3), e: float = 0.5):
        c_ = int(cout * e)
        self.cv1 = Conv(cin, c_, k[0], 1)
        self.cv2 = Conv(c_, cout, k[1], 1, groups=groups)
        self.add = shortcut and cin == cout

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"cv1": self.cv1.init(k1), "cv2": self.cv2.init(k2)}

    def __call__(self, params, x):
        y = self.cv2(params["cv2"], self.cv1(params["cv1"], x))
        return x + y if self.add else y


class C2f:
    """Cross-stage partial block with n bottlenecks (YOLOv8 C2f)."""

    def __init__(self, cin: int, cout: int, n: int = 1, shortcut: bool = False,
                 groups: int = 1, e: float = 0.5):
        self.c = int(cout * e)
        self.n = n
        self.cv1 = Conv(cin, 2 * self.c, 1, 1)
        self.cv2 = Conv((2 + n) * self.c, cout, 1, 1)
        self.m = [Bottleneck(self.c, self.c, shortcut, groups, k=(3, 3), e=1.0)
                  for _ in range(n)]

    def init(self, key):
        keys = jax.random.split(key, 2 + self.n)
        return {"cv1": self.cv1.init(keys[0]), "cv2": self.cv2.init(keys[1]),
                "m": [b.init(k) for b, k in zip(self.m, keys[2:])]}

    def __call__(self, params, x):
        y = self.cv1(params["cv1"], x)
        parts = [y[..., :self.c], y[..., self.c:]]
        for block, p in zip(self.m, params["m"]):
            parts.append(block(p, parts[-1]))
        return self.cv2(params["cv2"], jnp.concatenate(parts, axis=-1))


class C3:
    """CSP bottleneck with 3 convs (basis of YOLO11's C3k)."""

    def __init__(self, cin: int, cout: int, n: int = 1, shortcut: bool = True,
                 groups: int = 1, e: float = 0.5, k: int = 3):
        c_ = int(cout * e)
        self.cv1 = Conv(cin, c_, 1, 1)
        self.cv2 = Conv(cin, c_, 1, 1)
        self.cv3 = Conv(2 * c_, cout, 1, 1)
        self.m = [Bottleneck(c_, c_, shortcut, groups, k=(k, k), e=1.0)
                  for _ in range(n)]

    def init(self, key):
        keys = jax.random.split(key, 3 + len(self.m))
        return {"cv1": self.cv1.init(keys[0]), "cv2": self.cv2.init(keys[1]),
                "cv3": self.cv3.init(keys[2]),
                "m": [b.init(k) for b, k in zip(self.m, keys[3:])]}

    def __call__(self, params, x):
        y1 = self.cv1(params["cv1"], x)
        for block, p in zip(self.m, params["m"]):
            y1 = block(p, y1)
        y2 = self.cv2(params["cv2"], x)
        return self.cv3(params["cv3"], jnp.concatenate([y1, y2], axis=-1))


class C3k2:
    """YOLO11 C3k2: C2f whose inner modules are C3k blocks or Bottlenecks."""

    def __init__(self, cin: int, cout: int, n: int = 1, c3k: bool = False,
                 e: float = 0.5, groups: int = 1, shortcut: bool = True):
        self.c = int(cout * e)
        self.n = n
        self.cv1 = Conv(cin, 2 * self.c, 1, 1)
        self.cv2 = Conv((2 + n) * self.c, cout, 1, 1)
        if c3k:
            self.m = [C3(self.c, self.c, 2, shortcut, groups, e=0.5, k=3)
                      for _ in range(n)]
        else:
            self.m = [Bottleneck(self.c, self.c, shortcut, groups, e=0.5)
                      for _ in range(n)]

    init = C2f.init
    __call__ = C2f.__call__


class SPPF:
    """Spatial pyramid pooling (fast): 3 chained 5x5 maxpools."""

    def __init__(self, cin: int, cout: int, k: int = 5):
        c_ = cin // 2
        self.k = k
        self.cv1 = Conv(cin, c_, 1, 1)
        self.cv2 = Conv(c_ * 4, cout, 1, 1)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"cv1": self.cv1.init(k1), "cv2": self.cv2.init(k2)}

    def __call__(self, params, x):
        y = self.cv1(params["cv1"], x)
        pad = self.k // 2

        def pool(v):
            # literal init value so XLA/autodiff recognize reduce_window_max
            return lax.reduce_window(
                v, -jnp.inf, lax.max, (1, self.k, self.k, 1), (1, 1, 1, 1),
                ((0, 0), (pad, pad), (pad, pad), (0, 0)))

        p1 = pool(y)
        p2 = pool(p1)
        p3 = pool(p2)
        return self.cv2(params["cv2"], jnp.concatenate([y, p1, p2, p3], axis=-1))


class Attention:
    """Multi-head attention over spatial positions with depthwise positional
    encoding (YOLO11 PSA attention)."""

    def __init__(self, dim: int, num_heads: int = 8, attn_ratio: float = 0.5):
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        self.scale = self.key_dim ** -0.5
        nh_kd = self.key_dim * num_heads
        h = dim + nh_kd * 2
        self.dim = dim
        self.qkv = Conv(dim, h, 1, act=False)
        self.proj = Conv(dim, dim, 1, act=False)
        self.pe = Conv(dim, dim, 3, 1, groups=dim, act=False)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {"qkv": self.qkv.init(k1), "proj": self.proj.init(k2),
                "pe": self.pe.init(k3)}

    def __call__(self, params, x):
        b, hh, ww, _ = x.shape
        n = hh * ww
        qkv = self.qkv(params["qkv"], x)  # [B,H,W, 2*nh_kd + dim]
        qkv = qkv.reshape(b, n, self.num_heads,
                          self.key_dim * 2 + self.head_dim)
        q = qkv[..., :self.key_dim]
        k = qkv[..., self.key_dim:self.key_dim * 2]
        v = qkv[..., self.key_dim * 2:]
        from caesar_yolo_tpu.models import pallas_attn
        if pallas_attn.supported(n):
            # fused qk/softmax/av, score matrix VMEM-resident (the XLA
            # einsum path ran at 11% peak and wrote the [B,h,N,N] f32
            # scores to HBM — see pallas_attn.py)
            out = pallas_attn.attention_pallas(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), self.scale)
            out = out.transpose(0, 2, 1, 3)           # [B, N, h, hd]
        else:
            # attn[b, h, i, j] = q_i . k_j
            attn = jnp.einsum(
                "bnhk,bmhk->bhnm", q, k,
                preferred_element_type=jnp.float32) * self.scale
            attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
            out = jnp.einsum(
                "bhnm,bmhd->bnhd", attn, v,
                preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(b, hh, ww, self.dim)
        vmap = v.reshape(b, hh, ww, self.dim)
        out = out + self.pe(params["pe"], vmap)
        return self.proj(params["proj"], out)


class PSABlock:
    """Attention + tiny conv FFN, both residual (YOLO11)."""

    def __init__(self, c: int, attn_ratio: float = 0.5, num_heads: int = 4):
        self.attn = Attention(c, num_heads=num_heads, attn_ratio=attn_ratio)
        self.ffn1 = Conv(c, c * 2, 1)
        self.ffn2 = Conv(c * 2, c, 1, act=False)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {"attn": self.attn.init(k1), "ffn1": self.ffn1.init(k2),
                "ffn2": self.ffn2.init(k3)}

    def __call__(self, params, x):
        x = x + self.attn(params["attn"], x)
        y = self.ffn2(params["ffn2"], self.ffn1(params["ffn1"], x))
        return x + y


class C2PSA:
    """Partial self-attention stage after SPPF (YOLO11)."""

    def __init__(self, cin: int, cout: int, n: int = 1, e: float = 0.5):
        assert cin == cout
        self.c = int(cin * e)
        self.cv1 = Conv(cin, 2 * self.c, 1, 1)
        self.cv2 = Conv(2 * self.c, cin, 1, 1)
        self.m = [PSABlock(self.c, attn_ratio=0.5,
                           num_heads=max(1, self.c // 64)) for _ in range(n)]

    def init(self, key):
        keys = jax.random.split(key, 2 + len(self.m))
        return {"cv1": self.cv1.init(keys[0]), "cv2": self.cv2.init(keys[1]),
                "m": [b.init(k) for b, k in zip(self.m, keys[2:])]}

    def __call__(self, params, x):
        y = self.cv1(params["cv1"], x)
        a, b = y[..., :self.c], y[..., self.c:]
        for block, p in zip(self.m, params["m"]):
            b = block(p, b)
        return self.cv2(params["cv2"], jnp.concatenate([a, b], axis=-1))


# Upsample formulation switch (A/B via CY_UPSAMPLE env or
# set_upsample_mode): all modes are bit-exact pixel replication.
#   broadcast broadcast_in_dim + reshape (one logical pass) — DEFAULT:
#             fastest in isolation (2.26 vs 3.20 ms/batch for repeat on
#             v5e) and e2e (yolo11l 1117 vs 1107 t/s, yolov8n 6501 vs
#             6466 — onchip_r3b.log)
#   repeat    two jnp.repeat passes (XLA materializes both: ~9 traffic
#             units vs the 5-unit read-once/write-once floor)
#   pallas    single-pass VMEM kernel (ops/pallas_upsample.py), falls
#             back to repeat off-TPU or for unsupported shapes
import os as _os

_UPSAMPLE_MODE = _os.environ.get("CY_UPSAMPLE", "broadcast")


def set_upsample_mode(mode: str) -> None:
    """repeat | broadcast | pallas — affects subsequent traces."""
    global _UPSAMPLE_MODE
    assert mode in ("repeat", "broadcast", "pallas"), mode
    _UPSAMPLE_MODE = mode


class Upsample:
    """2x nearest-neighbor upsample (exact: pixel replication)."""

    def __init__(self, scale: int = 2):
        self.scale = scale

    def init(self, key):
        return {}

    def __call__(self, params, x):
        s = self.scale
        if s == 2 and _UPSAMPLE_MODE != "repeat":
            b, h, w, c = x.shape
            if _UPSAMPLE_MODE == "pallas":
                from caesar_yolo_tpu.ops import pallas_upsample
                if pallas_upsample.supported(h, w, c):
                    return pallas_upsample.upsample2x_pallas(x)
            else:  # broadcast
                y = jnp.broadcast_to(x[:, :, None, :, None, :],
                                     (b, h, 2, w, 2, c))
                return y.reshape(b, 2 * h, 2 * w, c)
        x = jnp.repeat(x, s, axis=1)
        return jnp.repeat(x, s, axis=2)


class Concat:
    """Channel concatenation of multiple inputs."""

    def init(self, key):
        return {}

    def __call__(self, params, xs: Sequence[jnp.ndarray]):
        return jnp.concatenate(list(xs), axis=-1)


def fuse_tree(layer, params):
    """Recursively fold BN into conv weights across a params subtree."""
    if isinstance(layer, Conv):
        return layer.fuse(params)
    if isinstance(params, dict):
        # the generic recursion covers block lists too: getattr(layer,
        # "m") hits the list branch below
        return {name: (fuse_tree(getattr(layer, name, None), sub)
                       if getattr(layer, name, None) is not None else sub)
                for name, sub in params.items()}
    if isinstance(params, list) and hasattr(layer, "__iter__"):
        return [fuse_tree(bl, p) for bl, p in zip(layer, params)]
    return params
