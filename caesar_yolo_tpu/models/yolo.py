"""YOLOv8 / YOLO11 detector graphs in functional JAX (NHWC, TPU-native).

Re-derivation of the published ultralytics architectures the reference
drives as a black box through `model()` (reference evaluation.py:181-193)
and `model.train` (reference macros/run_train.py:11-45).  Nothing here is
a port: models are explicit layer graphs over the block zoo in
`models/layers.py`, parameters are nested-dict pytrees, and the forward
pass is a pure function suitable for `jax.jit` / `pjit`.

Supported model families x scales (matching the reference README table,
README.md:190-207): yolov8{n,s,m,l,x}, yolo11{n,s,m,l,x}.

Output protocol: `forward(params, x[B,H,W,C])` returns, per FPN level
(strides 8/16/32), the raw head tensors `(box[B,Hl,Wl,4*REG_MAX],
cls[B,Hl,Wl,NC])`.  `decode(...)` turns those into
`(boxes_xyxy[B,A,4], scores[B,A,NC])` in input-image pixels via
DFL-expectation decoding — all fixed-shape, jit-compatible.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from caesar_yolo_tpu.models.layers import (
    C2PSA,
    C2f,
    C3k2,
    Concat,
    Conv,
    Conv2dRaw,
    SPPF,
    Upsample,
    make_divisible,
)

REG_MAX = 16  # DFL bins per box side
STRIDES = (8, 16, 32)

# (depth_mult, width_mult, max_channels)
V8_SCALES = {
    "n": (0.33, 0.25, 1024),
    "s": (0.33, 0.50, 1024),
    "m": (0.67, 0.75, 768),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.25, 512),
}
V11_SCALES = {
    "n": (0.50, 0.25, 1024),
    "s": (0.50, 0.50, 1024),
    "m": (0.50, 1.00, 512),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.50, 512),
}


def _depth(n: int, d: float) -> int:
    return max(round(n * d), 1) if n > 1 else n


@dataclass
class LayerSpec:
    """One node of the detector graph."""
    module: object
    frm: tuple        # input layer indices (-1 = previous)
    name: str


class DWConv(Conv):
    """Depthwise conv block (YOLO11 detect-head cls branch)."""

    def __init__(self, cin: int, cout: int, k: int = 3, s: int = 1,
                 act: bool = True):
        super().__init__(cin, cout, k, s, groups=math.gcd(cin, cout), act=act)


class DetectHead:
    """Decoupled anchor-free detect head (v8 'legacy' / v11 DW variant).

    Per level: box branch -> 4*REG_MAX channels, cls branch -> NC channels.
    """

    def __init__(self, num_classes: int, chs: tuple, legacy: bool):
        self.nc = num_classes
        self.chs = chs
        self.legacy = legacy
        c2 = max(16, chs[0] // 4, REG_MAX * 4)
        c3 = max(chs[0], min(num_classes, 100))
        self.c2, self.c3 = c2, c3
        self.box_branches = []
        self.cls_branches = []
        for ch in chs:
            self.box_branches.append([
                Conv(ch, c2, 3), Conv(c2, c2, 3), Conv2dRaw(c2, 4 * REG_MAX, 1)])
            if legacy:
                self.cls_branches.append([
                    Conv(ch, c3, 3), Conv(c3, c3, 3), Conv2dRaw(c3, self.nc, 1)])
            else:
                self.cls_branches.append([
                    DWConv(ch, ch, 3), Conv(ch, c3, 1),
                    DWConv(c3, c3, 3), Conv(c3, c3, 1),
                    Conv2dRaw(c3, self.nc, 1)])

    def init(self, key):
        params = {"box": [], "cls": []}
        keys = jax.random.split(key, 2 * len(self.chs))
        for i, (bb, cb) in enumerate(zip(self.box_branches, self.cls_branches)):
            bkeys = jax.random.split(keys[2 * i], len(bb))
            ckeys = jax.random.split(keys[2 * i + 1], len(cb))
            params["box"].append([m.init(k) for m, k in zip(bb, bkeys)])
            params["cls"].append([m.init(k) for m, k in zip(cb, ckeys)])
        # bias priors (ultralytics Detect.bias_init): box bias = 1.0,
        # cls bias = log(5 / nc / (640/stride)^2) so initial objectness
        # starts near ~5 objects per 640px image.
        for i, stride in enumerate(STRIDES):
            params["box"][i][-1]["b"] = jnp.ones_like(params["box"][i][-1]["b"])
            cls_b = math.log(5.0 / self.nc / (640.0 / stride) ** 2)
            params["cls"][i][-1]["b"] = jnp.full_like(
                params["cls"][i][-1]["b"], cls_b)
        return params

    def __call__(self, params, feats):
        outs = []
        for i, x in enumerate(feats):
            b = x
            for m, p in zip(self.box_branches[i], params["box"][i]):
                b = m(p, b)
            c = x
            for m, p in zip(self.cls_branches[i], params["cls"][i]):
                c = m(p, c)
            outs.append((b, c))
        return tuple(outs)


def _build_v8(scale: str, nc: int, in_ch: int):
    d, w, mc = V8_SCALES[scale]

    def ch(c):
        return make_divisible(min(c, mc) * w, 8)

    L = []

    def add(module, frm, name):
        L.append(LayerSpec(module, frm if isinstance(frm, tuple) else (frm,),
                           name))

    add(Conv(in_ch, ch(64), 3, 2), -1, "stem")                      # 0  P1/2
    add(Conv(ch(64), ch(128), 3, 2), -1, "down1")                   # 1  P2/4
    add(C2f(ch(128), ch(128), _depth(3, d), True), -1, "c2f_1")     # 2
    add(Conv(ch(128), ch(256), 3, 2), -1, "down2")                  # 3  P3/8
    add(C2f(ch(256), ch(256), _depth(6, d), True), -1, "c2f_2")     # 4
    add(Conv(ch(256), ch(512), 3, 2), -1, "down3")                  # 5  P4/16
    add(C2f(ch(512), ch(512), _depth(6, d), True), -1, "c2f_3")     # 6
    add(Conv(ch(512), ch(1024), 3, 2), -1, "down4")                 # 7  P5/32
    add(C2f(ch(1024), ch(1024), _depth(3, d), True), -1, "c2f_4")   # 8
    add(SPPF(ch(1024), ch(1024), 5), -1, "sppf")                    # 9
    add(Upsample(2), -1, "up1")                                     # 10
    add(Concat(), (-1, 6), "cat1")                                  # 11
    add(C2f(ch(1024) + ch(512), ch(512), _depth(3, d), False),
        -1, "neck_p4a")                                             # 12
    add(Upsample(2), -1, "up2")                                     # 13
    add(Concat(), (-1, 4), "cat2")                                  # 14
    add(C2f(ch(512) + ch(256), ch(256), _depth(3, d), False),
        -1, "neck_p3")                                              # 15 P3 out
    add(Conv(ch(256), ch(256), 3, 2), -1, "pan_down1")              # 16
    add(Concat(), (-1, 12), "cat3")                                 # 17
    add(C2f(ch(256) + ch(512), ch(512), _depth(3, d), False),
        -1, "neck_p4")                                              # 18 P4 out
    add(Conv(ch(512), ch(512), 3, 2), -1, "pan_down2")              # 19
    add(Concat(), (-1, 9), "cat4")                                  # 20
    add(C2f(ch(512) + ch(1024), ch(1024), _depth(3, d), False),
        -1, "neck_p5")                                              # 21 P5 out
    head = DetectHead(nc, (ch(256), ch(512), ch(1024)), legacy=True)
    return L, head, (15, 18, 21)


def _build_v11(scale: str, nc: int, in_ch: int):
    d, w, mc = V11_SCALES[scale]
    c3k_all = scale in ("m", "l", "x")

    def ch(c):
        return make_divisible(min(c, mc) * w, 8)

    L = []

    def add(module, frm, name):
        L.append(LayerSpec(module, frm if isinstance(frm, tuple) else (frm,),
                           name))

    k2 = _depth(2, d)
    add(Conv(in_ch, ch(64), 3, 2), -1, "stem")                          # 0
    add(Conv(ch(64), ch(128), 3, 2), -1, "down1")                       # 1
    add(C3k2(ch(128), ch(256), k2, c3k=c3k_all, e=0.25), -1, "c3k2_1")  # 2
    add(Conv(ch(256), ch(256), 3, 2), -1, "down2")                      # 3
    add(C3k2(ch(256), ch(512), k2, c3k=c3k_all, e=0.25), -1, "c3k2_2")  # 4
    add(Conv(ch(512), ch(512), 3, 2), -1, "down3")                      # 5
    add(C3k2(ch(512), ch(512), k2, c3k=True), -1, "c3k2_3")             # 6
    add(Conv(ch(512), ch(1024), 3, 2), -1, "down4")                     # 7
    add(C3k2(ch(1024), ch(1024), k2, c3k=True), -1, "c3k2_4")           # 8
    add(SPPF(ch(1024), ch(1024), 5), -1, "sppf")                        # 9
    add(C2PSA(ch(1024), ch(1024), k2), -1, "c2psa")                     # 10
    add(Upsample(2), -1, "up1")                                         # 11
    add(Concat(), (-1, 6), "cat1")                                      # 12
    add(C3k2(ch(1024) + ch(512), ch(512), k2, c3k=c3k_all),
        -1, "neck_p4a")                                                 # 13
    add(Upsample(2), -1, "up2")                                         # 14
    add(Concat(), (-1, 4), "cat2")                                      # 15
    add(C3k2(ch(512) + ch(512), ch(256), k2, c3k=c3k_all),
        -1, "neck_p3")                                                  # 16
    add(Conv(ch(256), ch(256), 3, 2), -1, "pan_down1")                  # 17
    add(Concat(), (-1, 13), "cat3")                                     # 18
    add(C3k2(ch(256) + ch(512), ch(512), k2, c3k=c3k_all),
        -1, "neck_p4")                                                  # 19
    add(Conv(ch(512), ch(512), 3, 2), -1, "pan_down2")                  # 20
    add(Concat(), (-1, 10), "cat4")                                     # 21
    add(C3k2(ch(512) + ch(1024), ch(1024), k2, c3k=True),
        -1, "neck_p5")                                                  # 22
    head = DetectHead(nc, (ch(256), ch(512), ch(1024)), legacy=False)
    return L, head, (16, 19, 22)


# note: C3k2's yaml 'shortcut' column defaults True; flags above follow the
# published yolo11.yaml rows (False for the e=0.25 pair is expressed via the
# c3k arg, not shortcut).


class YOLO:
    """A YOLOv8/YOLO11 detector as an explicit layer graph.

    version: 'v8' | 'v11'; scale: n/s/m/l/x; num_classes defaults to the
    reference's 5 radio-source classes (reference README.md:154-161).
    """

    CLASS_NAMES = ("spurious", "compact", "extended", "extended-multisland",
                   "flagged")

    def __init__(self, version: str = "v8", scale: str = "n",
                 num_classes: int = 5, in_channels: int = 3):
        self.version, self.scale = version, scale
        self.num_classes = num_classes
        self.in_channels = in_channels
        if version == "v8":
            self.layers, self.head, self.out_idx = _build_v8(
                scale, num_classes, in_channels)
        elif version == "v11":
            self.layers, self.head, self.out_idx = _build_v11(
                scale, num_classes, in_channels)
        else:
            raise ValueError(f"unknown version {version!r} (use 'v8'/'v11')")

    # -- parameters ---------------------------------------------------------

    def init(self, key) -> dict:
        keys = jax.random.split(key, len(self.layers) + 1)
        params = {}
        for spec, k in zip(self.layers, keys[:-1]):
            if hasattr(spec.module, "init"):
                p = spec.module.init(k)
                if p:
                    params[spec.name] = p
        params["head"] = self.head.init(keys[-1])
        return params

    # -- forward ------------------------------------------------------------

    def forward_features(self, params, x, *, remat: bool = False):
        """Run backbone+neck; returns the 3 FPN feature maps (P3, P4, P5).

        remat=True wraps each parameterized layer in jax.checkpoint:
        block-internal activations (C2f/C3k2 hidden convs — the bulk of
        training-time HBM) are dropped after the forward pass and
        recomputed during backward.  The layer OUTPUTS in `saved` are
        skip-connection residuals that must live regardless, so per-layer
        granularity is the natural checkpoint boundary for this graph.
        """
        saved = {}
        prev = x
        for i, spec in enumerate(self.layers):
            inputs = [prev if j == -1 else saved[j] for j in spec.frm]
            p = params.get(spec.name, {})
            if isinstance(spec.module, Concat):
                prev = spec.module(p, inputs)
            elif remat and p:
                prev = jax.checkpoint(
                    lambda pp, xx, m=spec.module: m(pp, xx))(p, inputs[0])
            else:
                prev = spec.module(p, inputs[0])
            saved[i] = prev
        return tuple(saved[i] for i in self.out_idx)

    def __call__(self, params, x, *, remat: bool = False):
        """Full raw forward: ((box_l, cls_l) for l in P3,P4,P5)."""
        feats = self.forward_features(params, x, remat=remat)
        if remat:
            return jax.checkpoint(self.head.__call__)(params["head"], feats)
        return self.head(params["head"], feats)

    # -- decode -------------------------------------------------------------

    def decode(self, raw, img_size: int):
        """DFL decode raw head outputs into (boxes_xyxy[B,A,4],
        scores[B,A,NC]) in input-image pixels.  A = sum_l (S/stride_l)^2."""
        return decode_dfl(raw, img_size)


def anchor_points(img_size: int, strides=STRIDES, offset: float = 0.5):
    """Grid-cell centers (in grid units) and per-anchor stride, concatenated
    over FPN levels.  Fixed shapes for a given img_size."""
    pts, strs = [], []
    for s in strides:
        n = img_size // s
        xs = (np.arange(n, dtype=np.float32) + offset)
        xx, yy = np.meshgrid(xs, xs)
        pts.append(np.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1))
        strs.append(np.full((n * n, 1), s, dtype=np.float32))
    return jnp.asarray(np.concatenate(pts)), jnp.asarray(np.concatenate(strs))


def flatten_raw(raw):
    """Flatten per-level head outputs into (dist[B, A, 4, REG_MAX],
    logits[B, A, NC]) in their native dtype — no softmax/sigmoid applied.
    A = sum_l (S/stride_l)^2, levels concatenated in stride order (the
    anchor_points order)."""
    dist_lvls, cls_lvls = [], []
    for (box, cls) in raw:
        b, h, w, _ = box.shape
        dist_lvls.append(box.reshape(b, h * w, 4, REG_MAX))
        cls_lvls.append(cls.reshape(b, h * w, -1))
    return (jnp.concatenate(dist_lvls, axis=1),
            jnp.concatenate(cls_lvls, axis=1))


def decode_dfl_window(dist, anchors, strides):
    """DFL decode for an already-gathered anchor window: dist
    [..., 4, REG_MAX] raw logits, anchors [..., 2] grid-unit centers,
    strides [..., 1] -> xyxy boxes [..., 4] in input pixels.  Same math
    (f32 softmax-expectation) as decode_dfl, batched or not."""
    prob = jax.nn.softmax(dist.astype(jnp.float32), axis=-1)
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    ltrb = jnp.einsum("...fr,r->...f", prob, bins)
    xy1 = (anchors - ltrb[..., 0:2]) * strides
    xy2 = (anchors + ltrb[..., 2:4]) * strides
    return jnp.concatenate([xy1, xy2], axis=-1)


def decode_dfl(raw, img_size: int):
    """Shared DFL decode: softmax-expectation over REG_MAX bins -> l,t,r,b
    distances from anchor centers -> xyxy pixels; sigmoid class scores."""
    dist, logits = flatten_raw(raw)
    anchors, strides = anchor_points(img_size)
    boxes = decode_dfl_window(dist, anchors[None], strides[None])
    scores = jax.nn.sigmoid(logits.astype(jnp.float32))
    return boxes, scores


def build_model(name: str, num_classes: int = 5, in_channels: int = 3) -> YOLO:
    """Build from a reference-style name: 'yolov8n', 'yolo11l', ...

    Mirrors how the reference selects architectures by weight-file name
    (README.md:190-207)."""
    name = name.lower()
    for prefix, version in (("yolov8", "v8"), ("yolo11", "v11"),
                            ("yolov11", "v11")):
        if name.startswith(prefix):
            scale = name[len(prefix):][:1] or "n"
            if scale not in "nsmlx":
                # validated HERE so 'yolo11best' fails with a usable
                # message instead of a KeyError deep in graph building
                raise ValueError(
                    f"cannot parse model name {name!r}: scale {scale!r} "
                    f"is not one of n/s/m/l/x")
            return YOLO(version, scale, num_classes, in_channels)
    raise ValueError(f"cannot parse model name {name!r}")


def init_params(model: YOLO, seed: int = 0) -> dict:
    return model.init(jax.random.PRNGKey(seed))


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
