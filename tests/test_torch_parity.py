"""Activation-level parity vs torch implementations of the published
block definitions.

These tests build each ultralytics-style block in torch (from the
published architecture, NCHW), map its state_dict through the REAL
converter (models/convert._Mapper), and assert the JAX block produces the
same activations — the insurance that converted .pt checkpoints will
reproduce reference detections (SURVEY.md hard part #1).
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

from caesar_yolo_tpu.models import layers as L
from caesar_yolo_tpu.models.convert import _Mapper


def t2j(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def j2t(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


class TConv(nn.Module):
    """ultralytics Conv: Conv2d + BN(eps=1e-3) + SiLU."""

    def __init__(self, c1, c2, k=1, s=1, g=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, groups=g, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3)
        self.act = nn.SiLU() if act else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True, g=1, k=(3, 3), e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, k[0], 1)
        self.cv2 = TConv(c_, c2, k[1], 1, g=g)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False, g=1, e=0.5):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = TConv(c1, 2 * self.c, 1, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(
            TBottleneck(self.c, self.c, shortcut, g, k=(3, 3), e=1.0)
            for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c_ * 4, c2, 1, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class TAttention(nn.Module):
    """ultralytics (YOLO11) Attention."""

    def __init__(self, dim, num_heads=2, attn_ratio=0.5):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        self.scale = self.key_dim ** -0.5
        nh_kd = self.key_dim * num_heads
        h = dim + nh_kd * 2
        self.qkv = TConv(dim, h, 1, act=False)
        self.proj = TConv(dim, dim, 1, act=False)
        self.pe = TConv(dim, dim, 3, 1, g=dim, act=False)

    def forward(self, x):
        B, C, H, W = x.shape
        N = H * W
        qkv = self.qkv(x)
        q, k, v = qkv.view(B, self.num_heads,
                           self.key_dim * 2 + self.head_dim, N).split(
            [self.key_dim, self.key_dim, self.head_dim], dim=2)
        attn = (q.transpose(-2, -1) @ k) * self.scale
        attn = attn.softmax(dim=-1)
        x = (v @ attn.transpose(-2, -1)).view(B, C, H, W) + self.pe(
            v.reshape(B, C, H, W))
        return self.proj(x)


def rand_t(*shape, seed=0):
    g = torch.Generator().manual_seed(seed)
    return torch.rand(*shape, generator=g)


def _randomize_bn(mod, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in mod.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + .5)
                m.bias.copy_(torch.rand(m.bias.shape, generator=g) - .5)
                m.running_mean.copy_(
                    torch.rand(m.running_mean.shape, generator=g) - .5)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + .5)


def _state(mod, prefix="m"):
    return {f"{prefix}.{k}": v.detach().numpy()
            for k, v in mod.state_dict().items()}


def assert_close(jax_out, torch_out, tol=2e-4):
    np.testing.assert_allclose(j2t(jax_out), torch_out.detach().numpy(),
                               rtol=tol, atol=tol)


def test_bottleneck_parity():
    tm = TBottleneck(16, 16, shortcut=True).eval()
    _randomize_bn(tm)
    jm = L.Bottleneck(16, 16, shortcut=True)
    params = _Mapper(_state(tm)).bottleneck("m")
    x = rand_t(2, 16, 12, 12)
    with torch.no_grad():
        assert_close(jm(params, t2j(x)), tm(x))


def test_c2f_parity():
    tm = TC2f(16, 24, n=2, shortcut=True).eval()
    _randomize_bn(tm)
    jm = L.C2f(16, 24, n=2, shortcut=True)
    params = _Mapper(_state(tm)).c2f(jm, "m")
    x = rand_t(1, 16, 16, 16)
    with torch.no_grad():
        assert_close(jm(params, t2j(x)), tm(x))


def test_sppf_parity():
    tm = TSPPF(32, 32).eval()
    _randomize_bn(tm)
    jm = L.SPPF(32, 32)
    params = _Mapper(_state(tm)).sppf("m")
    x = rand_t(1, 32, 20, 20)
    with torch.no_grad():
        assert_close(jm(params, t2j(x)), tm(x))


def test_attention_parity():
    tm = TAttention(64, num_heads=2).eval()
    _randomize_bn(tm)
    jm = L.Attention(64, num_heads=2)
    params = _Mapper(_state(tm)).attention("m")
    x = rand_t(2, 64, 8, 8)
    with torch.no_grad():
        assert_close(jm(params, t2j(x)), tm(x), tol=5e-4)


def test_strided_conv_grid_alignment():
    """Stride-2 k=3 conv with pad=1 must produce the exact torch grid —
    the whole detector's spatial alignment rests on this."""
    tm = TConv(3, 8, k=3, s=2).eval()
    _randomize_bn(tm)
    jm = L.Conv(3, 8, 3, 2)
    params = _Mapper(_state(tm)).conv_block("m")
    for hw in (64, 65, 66, 67):
        x = rand_t(1, 3, hw, hw, seed=hw)
        with torch.no_grad():
            assert_close(jm(params, t2j(x)), tm(x))


class TDetect(nn.Module):
    """v8 'legacy' detect head (box cv2 + cls cv3 branches)."""

    def __init__(self, nc, chs):
        super().__init__()
        c2 = max(16, chs[0] // 4, 64)
        c3 = max(chs[0], min(nc, 100))
        self.cv2 = nn.ModuleList(
            nn.Sequential(TConv(ch, c2, 3), TConv(c2, c2, 3),
                          nn.Conv2d(c2, 64, 1)) for ch in chs)
        self.cv3 = nn.ModuleList(
            nn.Sequential(TConv(ch, c3, 3), TConv(c3, c3, 3),
                          nn.Conv2d(c3, nc, 1)) for ch in chs)

    def forward(self, feats):
        return [(self.cv2[i](x), self.cv3[i](x))
                for i, x in enumerate(feats)]


class TYoloV8(nn.Module):
    """Full yolov8 graph in torch with model.{i} indices matching the
    published yaml rows (and models/yolo._build_v8's layer list)."""

    def __init__(self, nc=5, w=0.25, d=0.33):
        super().__init__()
        def ch(c): return max(8, int(min(c, 1024) * w + 4) // 8 * 8)
        def n(x): return max(round(x * d), 1)
        self.model = nn.ModuleList([
            TConv(3, ch(64), 3, 2),                           # 0
            TConv(ch(64), ch(128), 3, 2),                     # 1
            TC2f(ch(128), ch(128), n(3), True),               # 2
            TConv(ch(128), ch(256), 3, 2),                    # 3
            TC2f(ch(256), ch(256), n(6), True),               # 4
            TConv(ch(256), ch(512), 3, 2),                    # 5
            TC2f(ch(512), ch(512), n(6), True),               # 6
            TConv(ch(512), ch(1024), 3, 2),                   # 7
            TC2f(ch(1024), ch(1024), n(3), True),             # 8
            TSPPF(ch(1024), ch(1024)),                        # 9
            nn.Upsample(scale_factor=2, mode="nearest"),      # 10
            nn.Identity(),                                    # 11 concat
            TC2f(ch(1024) + ch(512), ch(512), n(3), False),   # 12
            nn.Upsample(scale_factor=2, mode="nearest"),      # 13
            nn.Identity(),                                    # 14 concat
            TC2f(ch(512) + ch(256), ch(256), n(3), False),    # 15
            TConv(ch(256), ch(256), 3, 2),                    # 16
            nn.Identity(),                                    # 17 concat
            TC2f(ch(256) + ch(512), ch(512), n(3), False),    # 18
            TConv(ch(512), ch(512), 3, 2),                    # 19
            nn.Identity(),                                    # 20 concat
            TC2f(ch(512) + ch(1024), ch(1024), n(3), False),  # 21
            TDetect(nc, (ch(256), ch(512), ch(1024))),        # 22
        ])

    def forward(self, x):
        m = self.model
        x0 = m[0](x); x1 = m[1](x0); x2 = m[2](x1); x3 = m[3](x2)
        x4 = m[4](x3); x5 = m[5](x4); x6 = m[6](x5); x7 = m[7](x6)
        x8 = m[8](x7); x9 = m[9](x8)
        y = m[12](torch.cat([m[10](x9), x6], 1))
        p3 = m[15](torch.cat([m[13](y), x4], 1))
        p4 = m[18](torch.cat([m[16](p3), y], 1))
        p5 = m[21](torch.cat([m[19](p4), x9], 1))
        return m[22]([p3, p4, p5])


def test_full_yolov8_graph_parity():
    """Whole-graph activation parity: torch v8n -> convert_state_dict ->
    JAX forward produces the same raw head tensors."""
    from caesar_yolo_tpu.models.convert import convert_state_dict
    from caesar_yolo_tpu.models.yolo import build_model
    torch.manual_seed(0)
    tm = TYoloV8(nc=5).eval()
    _randomize_bn(tm, seed=3)
    jm = build_model("yolov8n", num_classes=5)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_state_dict(sd, jm)
    x = rand_t(1, 3, 64, 64, seed=5)
    with torch.no_grad():
        t_raw = tm(x)
    j_raw = jm(params, t2j(x))
    for (jb, jc), (tb, tc) in zip(j_raw, t_raw):
        np.testing.assert_allclose(j2t(jb), tb.numpy(), rtol=3e-3, atol=3e-4)
        np.testing.assert_allclose(j2t(jc), tc.numpy(), rtol=3e-3, atol=3e-4)


class TC3(nn.Module):
    """C3 with k-sized bottlenecks, e=1.0 inner (ultralytics C3k)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5, k=3):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c1, c_, 1, 1)
        self.cv3 = TConv(2 * c_, c2, 1)
        self.m = nn.Sequential(*(TBottleneck(c_, c_, shortcut, g,
                                             k=(k, k), e=1.0)
                                 for _ in range(n)))

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class TC3k2(nn.Module):
    def __init__(self, c1, c2, n=1, c3k=False, e=0.5, g=1, shortcut=True):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = TConv(c1, 2 * self.c, 1, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(
            TC3(self.c, self.c, 2, shortcut, g) if c3k
            else TBottleneck(self.c, self.c, shortcut, g)
            for _ in range(n))

    forward = TC2f.forward


class TPSABlock(nn.Module):
    def __init__(self, c, attn_ratio=0.5, num_heads=4):
        super().__init__()
        self.attn = TAttention(c, num_heads=num_heads, attn_ratio=attn_ratio)
        self.ffn = nn.Sequential(TConv(c, c * 2, 1), TConv(c * 2, c, 1,
                                                           act=False))

    def forward(self, x):
        x = x + self.attn(x)
        return x + self.ffn(x)


class TC2PSA(nn.Module):
    def __init__(self, c1, c2, n=1, e=0.5):
        super().__init__()
        self.c = int(c1 * e)
        self.cv1 = TConv(c1, 2 * self.c, 1, 1)
        self.cv2 = TConv(2 * self.c, c1, 1)
        self.m = nn.Sequential(*(TPSABlock(self.c, 0.5,
                                           max(1, self.c // 64))
                                 for _ in range(n)))

    def forward(self, x):
        a, b = self.cv1(x).split((self.c, self.c), dim=1)
        b = self.m(b)
        return self.cv2(torch.cat((a, b), 1))


def test_c3k2_parity():
    for c3k in (False, True):
        tm = TC3k2(32, 32, n=1, c3k=c3k).eval()
        _randomize_bn(tm, seed=int(c3k))
        jm = L.C3k2(32, 32, 1, c3k=c3k)
        params = _Mapper(_state(tm)).c3k2(jm, "m")
        x = rand_t(1, 32, 16, 16, seed=int(c3k))
        with torch.no_grad():
            assert_close(jm(params, t2j(x)), tm(x), tol=5e-4)


def test_c2psa_parity():
    tm = TC2PSA(128, 128, n=1).eval()
    _randomize_bn(tm, seed=9)
    jm = L.C2PSA(128, 128, 1)
    params = _Mapper(_state(tm)).c2psa(jm, "m")
    x = rand_t(1, 128, 8, 8, seed=9)
    with torch.no_grad():
        assert_close(jm(params, t2j(x)), tm(x), tol=1e-3)


class TDWConv(TConv):
    def __init__(self, c1, c2, k=3, s=1, act=True):
        import math
        super().__init__(c1, c2, k, s, g=math.gcd(c1, c2), act=act)


class TDetectV11(nn.Module):
    """v11 detect head: DW-separable cls branch (legacy=False)."""

    def __init__(self, nc, chs):
        super().__init__()
        c2 = max(16, chs[0] // 4, 64)
        c3 = max(chs[0], min(nc, 100))
        self.cv2 = nn.ModuleList(
            nn.Sequential(TConv(ch, c2, 3), TConv(c2, c2, 3),
                          nn.Conv2d(c2, 64, 1)) for ch in chs)
        self.cv3 = nn.ModuleList(
            nn.Sequential(
                nn.Sequential(TDWConv(ch, ch, 3), TConv(ch, c3, 1)),
                nn.Sequential(TDWConv(c3, c3, 3), TConv(c3, c3, 1)),
                nn.Conv2d(c3, nc, 1)) for ch in chs)

    def forward(self, feats):
        return [(self.cv2[i](x), self.cv3[i](x))
                for i, x in enumerate(feats)]


def test_detect_head_v11_parity():
    from caesar_yolo_tpu.models.yolo import DetectHead
    chs = (64, 128, 256)
    tm = TDetectV11(5, chs).eval()
    _randomize_bn(tm, seed=4)
    jh = DetectHead(5, chs, legacy=False)
    params = _Mapper(_state(tm)).detect_head(jh, "m")
    feats_t = [rand_t(1, c, 8 // (2 ** i), 8 // (2 ** i), seed=i)
               for i, c in enumerate(chs)]
    with torch.no_grad():
        t_out = tm(feats_t)
    j_out = jh(params, tuple(t2j(f) for f in feats_t))
    for (jb, jc), (tb, tc) in zip(j_out, t_out):
        assert_close(jb, tb, tol=5e-4)
        assert_close(jc, tc, tol=5e-4)
