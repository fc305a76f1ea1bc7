"""YOLOv10 building blocks in Flax (NHWC, TPU-friendly).

These modules reproduce the *architecture semantics* of the YOLOv10 paper's
blocks (CSP C2f stages, spatial-channel decoupled downsampling, partial
self-attention, compact inverted blocks) so finetuned ultralytics checkpoints
can be converted weight-for-weight, while the implementation is idiomatic
JAX: NHWC layout, static shapes, `nn.BatchNorm` running stats for inference,
and everything fusable by XLA.

Module/parameter naming mirrors the ultralytics graph ("cv1", "cv2", "m0"…)
to keep the torch→flax weight converter (models/weights.py) mechanical.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBN(nn.Module):
    """Conv2d + BatchNorm + SiLU (ultralytics `Conv`)."""

    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.silu(x) if self.act else x


class Bottleneck(nn.Module):
    """Residual bottleneck with two convs (ultralytics `Bottleneck`)."""

    features: int
    shortcut: bool = True
    expansion: float = 0.5
    kernels: tuple[int, int] = (3, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        y = ConvBN(hidden, self.kernels[0], dtype=self.dtype, name="cv1")(x, train)
        y = ConvBN(self.features, self.kernels[1], dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class C2f(nn.Module):
    """CSP bottleneck with 2 convolutions, fast variant (ultralytics `C2f`)."""

    features: int
    n: int = 1
    shortcut: bool = False
    expansion: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.features * self.expansion)
        y = ConvBN(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            parts.append(
                Bottleneck(
                    c, self.shortcut, expansion=1.0, kernels=(3, 3),
                    dtype=self.dtype, name=f"m_{i}",
                )(parts[-1], train)
            )
        return ConvBN(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(parts, axis=-1), train
        )


class SCDown(nn.Module):
    """Spatial-channel decoupled downsampling (YOLOv10 `SCDown`):
    1×1 pointwise channel projection + k×k depthwise strided conv."""

    features: int
    kernel: int = 3
    stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.features, 1, dtype=self.dtype, name="cv1")(x, train)
        x = ConvBN(
            self.features, self.kernel, self.stride, groups=self.features,
            act=False, dtype=self.dtype, name="cv2",
        )(x, train)
        return x


class SPPF(nn.Module):
    """Spatial pyramid pooling, fast (3 chained max-pools)."""

    features: int
    pool: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        y = ConvBN(c_in // 2, 1, dtype=self.dtype, name="cv1")(x, train)
        k = self.pool
        pad = k // 2
        pools = [y]
        for _ in range(3):
            pools.append(
                nn.max_pool(
                    pools[-1], (k, k), strides=(1, 1),
                    padding=((pad, pad), (pad, pad)),
                )
            )
        return ConvBN(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(pools, axis=-1), train
        )


class Attention(nn.Module):
    """YOLOv10 PSA attention: conv-QKV MHSA with depthwise positional conv."""

    dim: int
    num_heads: int
    attn_ratio: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        N = H * W
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        scale = key_dim**-0.5
        nh_kd = key_dim * self.num_heads
        h = self.dim + nh_kd * 2

        qkv = ConvBN(h, 1, act=False, dtype=self.dtype, name="qkv")(x, train)
        qkv = qkv.reshape(B, N, self.num_heads, 2 * key_dim + head_dim)
        qkv = qkv.transpose(0, 2, 1, 3)  # (B, nh, N, d)
        q = qkv[..., :key_dim]
        k = qkv[..., key_dim : 2 * key_dim]
        v = qkv[..., 2 * key_dim :]

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, self.dim)

        v_img = v.transpose(0, 2, 1, 3).reshape(B, H, W, self.dim)
        pe = ConvBN(
            self.dim, 3, groups=self.dim, act=False, dtype=self.dtype, name="pe"
        )(v_img, train)
        out = out + pe
        return ConvBN(self.dim, 1, act=False, dtype=self.dtype, name="proj")(out, train)


class PSA(nn.Module):
    """Partial self-attention block (YOLOv10 `PSA`)."""

    features: int
    expansion: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.features * self.expansion)
        y = ConvBN(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        b = b + Attention(
            c, num_heads=max(1, c // 64), dtype=self.dtype, name="attn"
        )(b, train)
        ffn = ConvBN(c * 2, 1, dtype=self.dtype, name="ffn_0")(b, train)
        ffn = ConvBN(c, 1, act=False, dtype=self.dtype, name="ffn_1")(ffn, train)
        b = b + ffn
        return ConvBN(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([a, b], axis=-1), train
        )


class RepVGGDW(nn.Module):
    """Reparameterisable depthwise block: 7×7 DW + 3×3 DW, summed, SiLU."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = ConvBN(
            self.features, 7, groups=self.features, act=False,
            dtype=self.dtype, name="conv",
        )(x, train)
        b = ConvBN(
            self.features, 3, groups=self.features, act=False,
            dtype=self.dtype, name="conv1",
        )(x, train)
        return nn.silu(a + b)


class CIB(nn.Module):
    """Compact inverted block (YOLOv10 `CIB`)."""

    features: int
    shortcut: bool = True
    expansion: float = 0.5
    long_kernel: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        c_ = int(self.features * self.expansion)
        y = ConvBN(c_in, 3, groups=c_in, dtype=self.dtype, name="cv1_0")(x, train)
        y = ConvBN(2 * c_, 1, dtype=self.dtype, name="cv1_1")(y, train)
        if self.long_kernel:
            y = RepVGGDW(2 * c_, dtype=self.dtype, name="cv1_2")(y, train)
        else:
            y = ConvBN(2 * c_, 3, groups=2 * c_, dtype=self.dtype, name="cv1_2")(y, train)
        y = ConvBN(self.features, 1, dtype=self.dtype, name="cv1_3")(y, train)
        y = ConvBN(
            self.features, 3, groups=self.features, dtype=self.dtype, name="cv1_4"
        )(y, train)
        if self.shortcut and c_in == self.features:
            y = x + y
        return y


class C2fCIB(nn.Module):
    """C2f with CIB bottlenecks (YOLOv10 `C2fCIB`)."""

    features: int
    n: int = 1
    shortcut: bool = False
    long_kernel: bool = False
    expansion: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.features * self.expansion)
        y = ConvBN(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            parts.append(
                CIB(
                    c, self.shortcut, expansion=1.0, long_kernel=self.long_kernel,
                    dtype=self.dtype, name=f"m_{i}",
                )(parts[-1], train)
            )
        return ConvBN(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(parts, axis=-1), train
        )


def upsample2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2× upsample (NHWC)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


def make_divisible(v: float, divisor: int = 8) -> int:
    return max(divisor, int(v + divisor / 2) // divisor * divisor)


def scale_channels(c: int, width: float, max_channels: int) -> int:
    return make_divisible(min(c, max_channels) * width)


def scale_depth(n: int, depth: float) -> int:
    return max(round(n * depth), 1) if n > 1 else n
