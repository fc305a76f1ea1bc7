"""Torch NCHW reference of YOLOv10 with ultralytics' module layout and
state-dict key scheme.

Purpose: a *numeric golden* for the torch→flax weight converter
(tpu3dlm/models/weights.py::convert_yolov10_state_dict) and the Flax blocks
(tpu3dlm/models/layers.py). This mirrors what the reference pipeline loads
(src/detector/detector.py:36 `yolov10/best.pt`): an ultralytics
DetectionModel whose state dict is keyed "model.{i}.<module path>".

Independent re-implementation from the published YOLOv10 architecture —
BatchNorm eps=1e-3/momentum=0.03, SiLU activations, CSP C2f splits,
SCDown, SPPF, PSA attention, CIB/RepVGGDW, dual v10Detect heads — NOT
imported from ultralytics (package absent) and NOT copied from the
reference repo (which contains no model code).
"""

from __future__ import annotations

import copy

import torch
import torch.nn as nn

from tpu3dlm.models.yolov10 import (
    _DETECT_FROM,
    spec_for_variant,
    REG_MAX,
    yolov10_variant,
)
from tpu3dlm.models.layers import scale_channels, scale_depth


def autopad(k: int) -> int:
    return k // 2


class Conv(nn.Module):
    """Conv2d + BatchNorm2d(eps=1e-3, momentum=0.03) + SiLU."""

    def __init__(self, c1, c2, k=1, s=1, g=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, autopad(k), groups=g, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU() if act else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class Bottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True, g=1, k=(3, 3), e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, k[0], 1)
        self.cv2 = Conv(c_, c2, k[1], 1, g=g)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        return x + self.cv2(self.cv1(x)) if self.add else self.cv2(self.cv1(x))


class C2f(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False, g=1, e=0.5):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(
            Bottleneck(self.c, self.c, shortcut, g, k=(3, 3), e=1.0)
            for _ in range(n)
        )

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class SCDown(nn.Module):
    def __init__(self, c1, c2, k, s):
        super().__init__()
        self.cv1 = Conv(c1, c2, 1, 1)
        self.cv2 = Conv(c2, c2, k, s, g=c2, act=False)

    def forward(self, x):
        return self.cv2(self.cv1(x))


class SPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c_ * 4, c2, 1, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class Attention(nn.Module):
    def __init__(self, dim, num_heads=8, attn_ratio=0.5):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        self.scale = self.key_dim ** -0.5
        nh_kd = self.key_dim * num_heads
        h = dim + nh_kd * 2
        self.qkv = Conv(dim, h, 1, act=False)
        self.proj = Conv(dim, dim, 1, act=False)
        self.pe = Conv(dim, dim, 3, 1, g=dim, act=False)

    def forward(self, x):
        B, C, H, W = x.shape
        N = H * W
        qkv = self.qkv(x)
        q, k, v = qkv.view(
            B, self.num_heads, self.key_dim * 2 + self.head_dim, N
        ).split([self.key_dim, self.key_dim, self.head_dim], dim=2)
        attn = (q.transpose(-2, -1) @ k) * self.scale
        attn = attn.softmax(dim=-1)
        x = (v @ attn.transpose(-2, -1)).view(B, C, H, W) + self.pe(
            v.reshape(B, C, H, W)
        )
        return self.proj(x)


class PSA(nn.Module):
    def __init__(self, c1, c2, e=0.5):
        super().__init__()
        assert c1 == c2
        self.c = int(c1 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1)
        self.cv2 = Conv(2 * self.c, c1, 1)
        self.attn = Attention(self.c, attn_ratio=0.5, num_heads=self.c // 64)
        self.ffn = nn.Sequential(
            Conv(self.c, self.c * 2, 1), Conv(self.c * 2, self.c, 1, act=False)
        )

    def forward(self, x):
        a, b = self.cv1(x).split((self.c, self.c), dim=1)
        b = b + self.attn(b)
        b = b + self.ffn(b)
        return self.cv2(torch.cat((a, b), 1))


class RepVGGDW(nn.Module):
    def __init__(self, ed):
        super().__init__()
        self.conv = Conv(ed, ed, 7, 1, g=ed, act=False)
        self.conv1 = Conv(ed, ed, 3, 1, g=ed, act=False)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.conv(x) + self.conv1(x))


class CIB(nn.Module):
    def __init__(self, c1, c2, shortcut=True, e=0.5, lk=False):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = nn.Sequential(
            Conv(c1, c1, 3, g=c1),
            Conv(c1, 2 * c_, 1),
            RepVGGDW(2 * c_) if lk else Conv(2 * c_, 2 * c_, 3, g=2 * c_),
            Conv(2 * c_, c2, 1),
            Conv(c2, c2, 3, g=c2),
        )
        self.add = shortcut and c1 == c2

    def forward(self, x):
        return x + self.cv1(x) if self.add else self.cv1(x)


class C2fCIB(C2f):
    def __init__(self, c1, c2, n=1, shortcut=False, lk=False, g=1, e=0.5):
        super().__init__(c1, c2, n, shortcut, g, e)
        self.m = nn.ModuleList(
            CIB(self.c, self.c, shortcut, e=1.0, lk=lk) for _ in range(n)
        )


class v10Detect(nn.Module):
    """Dual-assignment detect head: cv2/cv3 (one-to-many) + one2one copies."""

    def __init__(self, nc, ch):
        super().__init__()
        self.nc = nc
        c2 = max(16, ch[0] // 4, REG_MAX * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = nn.ModuleList(
            nn.Sequential(
                Conv(x, c2, 3), Conv(c2, c2, 3), nn.Conv2d(c2, 4 * REG_MAX, 1)
            )
            for x in ch
        )
        self.cv3 = nn.ModuleList(
            nn.Sequential(
                nn.Sequential(Conv(x, x, 3, g=x), Conv(x, c3, 1)),
                nn.Sequential(Conv(c3, c3, 3, g=c3), Conv(c3, c3, 1)),
                nn.Conv2d(c3, nc, 1),
            )
            for x in ch
        )
        self.one2one_cv2 = copy.deepcopy(self.cv2)
        self.one2one_cv3 = copy.deepcopy(self.cv3)

    def forward(self, feats):
        o2m = [
            torch.cat((self.cv2[i](x), self.cv3[i](x)), 1)
            for i, x in enumerate(feats)
        ]
        o2o = [
            torch.cat((self.one2one_cv2[i](x), self.one2one_cv3[i](x)), 1)
            for i, x in enumerate(feats)
        ]
        return o2m, o2o


class TorchYOLOv10(nn.Module):
    """Full YOLOv10 assembled from the same spec table as the Flax model, so
    the graphs are congruent by construction and only the *numerics* and the
    *key scheme* are under test. Attribute name `model` reproduces the
    ultralytics DetectionModel state-dict prefix ("model.0.conv.weight")."""

    def __init__(self, nc=80, variant="n"):
        super().__init__()
        self._spec = spec_for_variant(variant)
        v = yolov10_variant(variant)
        ch = lambda c: scale_channels(c, v.width, v.max_channels)  # noqa: E731
        dp = lambda n: scale_depth(n, v.depth)  # noqa: E731

        mods: list[nn.Module] = []
        out_ch: list[int] = []  # channel bookkeeping per spec index
        cur = 3
        for i, (frm, n, mod, args) in enumerate(self._spec):
            if mod == "concat":
                mods.append(nn.Identity())
                out_ch.append(sum(out_ch[j] for j in frm))
                continue
            cin = out_ch[frm] if out_ch else cur
            if mod == "up":
                mods.append(nn.Upsample(scale_factor=2, mode="nearest"))
                out_ch.append(cin)
            elif mod == "Conv":
                mods.append(Conv(cin, ch(args[0]), args[1], args[2]))
                out_ch.append(ch(args[0]))
            elif mod == "C2f":
                mods.append(
                    C2f(cin, ch(args[0]), dp(n),
                        shortcut=bool(args[1]) if len(args) > 1 else False)
                )
                out_ch.append(ch(args[0]))
            elif mod == "SCDown":
                mods.append(SCDown(cin, ch(args[0]), args[1], args[2]))
                out_ch.append(ch(args[0]))
            elif mod == "SPPF":
                mods.append(SPPF(cin, ch(args[0]), args[1]))
                out_ch.append(ch(args[0]))
            elif mod == "PSA":
                mods.append(PSA(cin, ch(args[0])))
                out_ch.append(ch(args[0]))
            elif mod == "C2fCIB":
                mods.append(
                    C2fCIB(cin, ch(args[0]), dp(n), shortcut=bool(args[1]),
                           lk=bool(args[2]) if len(args) > 2 else False)
                )
                out_ch.append(ch(args[0]))
            else:
                raise ValueError(mod)
        mods.append(v10Detect(nc, tuple(out_ch[j] for j in _DETECT_FROM)))
        self._n_layers = len(self._spec)
        self.model = nn.ModuleList(mods)

    def forward(self, x):
        outputs: list[torch.Tensor] = []
        for i, (frm, n, mod, args) in enumerate(self._spec):
            if mod == "concat":
                outputs.append(torch.cat([outputs[j] for j in frm], dim=1))
                continue
            inp = outputs[frm] if outputs else x
            outputs.append(self.model[i](inp))
        feats = [outputs[j] for j in _DETECT_FROM]
        return self.model[self._n_layers](feats)


def randomize_(model: nn.Module, seed: int = 0) -> None:
    """Randomize BatchNorm affine params and running stats so converter
    mistakes (eps, scale/bias swap, mean/var swap) cannot cancel out against
    the defaults (weight=1, bias=0, mean=0, var=1). Conv weights keep their
    fan-in-scaled random init — uniformly large weights would blow up
    activation magnitudes and drown the comparison in fp32 accumulation
    noise."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.weight.copy_(
                    torch.empty_like(m.weight).uniform_(0.5, 1.5, generator=g)
                )
                m.bias.copy_(
                    torch.empty_like(m.bias).normal_(0.0, 0.1, generator=g)
                )
                m.running_mean.copy_(
                    torch.empty_like(m.running_mean).normal_(0.0, 0.1, generator=g)
                )
                m.running_var.copy_(
                    torch.empty_like(m.running_var).uniform_(0.5, 1.5, generator=g)
                )
