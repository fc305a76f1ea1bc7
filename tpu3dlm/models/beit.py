"""BEiT image classifier in Flax — batched damage classification.

TPU-native replacement for the reference's per-crop torch loop
(src/damage/classifier.py:55-90 — its own docstring flags the missing
batching as a deficiency). Here classification is one jitted call over a
padded (batch, 224, 224, 3) crop tensor, so a whole frame's sign crops — or
a whole scan's — classify in one device program.

Architecture matches HF ``BeitForImageClassification`` parameter-for-
parameter (patch embed, per-layer relative position bias, k-bias-free QKV,
layer-scale residuals, mean pooling + final LayerNorm head) so the
reference's finetuned checkpoints (BEiT-coarse/fine-finetuned,
classifier.py:32-35) convert directly via models/weights.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class BeitConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    num_labels: int = 2
    layer_norm_eps: float = 1e-12
    layer_scale_init_value: float = 0.1
    use_mean_pooling: bool = True
    # attention implementation: "einsum" (XLA, the golden-tested reference
    # path), "pallas" (fused VMEM-resident scores, ops/pallas/attention.py),
    # or "auto" = pallas on the TPU bf16 fast path, einsum everywhere else
    # (the f32 golden-parity path is never rerouted).
    attn_impl: str = "auto"
    # "none" (float Dense, the golden-tested path) or "int8": every encoder
    # Dense (QKV, attention output, fc1/fc2 — ~95% of the FLOPs) runs
    # int8×int8→int32 on the MXU (ops/quant.py) with per-channel weight and
    # dynamic per-row activation scales. Patch embed and the classifier head
    # stay float. Requires quantized params (models/weights.py::
    # quantize_beit_variables); accuracy gated in tests/test_quant.py.
    quant: str = "none"

    def __post_init__(self):
        # fail at construction (config load / pipeline setup), not minutes
        # later inside the first classify trace; _encoder_dense keeps a
        # backstop check for configs built by other means
        if self.quant not in ("none", "int8"):
            raise ValueError(
                f"BeitConfig.quant must be 'none' or 'int8', got "
                f"{self.quant!r} (beit_quant in variables.cfg)"
            )

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid


def resolve_attn_impl(cfg: BeitConfig, dtype) -> str:
    """The ONE resolution rule for ``BeitConfig.attn_impl == "auto"``:
    the fused Pallas kernel only on the TPU bf16 fast path, einsum
    everywhere else (f32 golden-parity path, every CPU/GPU backend).

    Shared by ``BeitAttention`` (which emits the pallas_call) and
    ``parallel/inference.full_scan_step_fn`` (which must wrap the classify
    in ``shard_map`` exactly when the kernel is active — GSPMD would
    replicate an opaque pallas_call). Keeping the rule in one place is what
    guarantees those two decisions can never drift apart."""
    impl = cfg.attn_impl
    if impl == "auto":
        impl = (
            "pallas"
            if dtype == jnp.bfloat16 and jax.default_backend() == "tpu"
            else "einsum"
        )
    return impl


def relative_position_index(grid: int) -> np.ndarray:
    """(N+1, N+1) int32 index into the relative-position-bias table.

    Window-relative 2D offsets for patch↔patch, plus three special entries
    for cls↔patch / patch↔cls / cls↔cls (the BEiT scheme).
    """
    h = w = grid
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)  # (2, N)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    num_rel = (2 * h - 1) * (2 * w - 1) + 3
    n = h * w
    index = np.zeros((n + 1, n + 1), np.int32)
    index[1:, 1:] = rel.sum(-1)
    index[0, 0:] = num_rel - 3
    index[0:, 0] = num_rel - 2
    index[0, 0] = num_rel - 1
    return index


class Int8Dense(nn.Module):
    """Dense with int8 kernel + per-output-channel scale (ops/quant.py).

    Parameter layout: ``kernel_q`` int8 (in, out), ``scale`` f32 (out,),
    optional ``bias`` f32 (out,). Produced from a float checkpoint by
    ``models/weights.py::quantize_beit_variables``; the random init below
    only exists so shape templates / smoke tests work without a conversion
    (it quantizes ONE lecun-normal draw into the kernel_q/scale pair, so
    the dequantized init matches Dense's init distribution).
    Inference-only: gradients do not flow through the rounding — finetune in
    float, quantize after.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from tpu3dlm.ops.quant import dense_int8, quantize_weight

        in_features = x.shape[-1]
        # kernel_q and scale must describe the SAME float draw (a code that
        # saturates ±127 is meaningless under another column's amax). Flax
        # folds a distinct rng into each param, so the pair is produced in
        # kernel_q_init — declared first, so it runs first in any init
        # trace — and handed to scale_init through this closure. Checkpoint
        # restore never calls inits, so restored pairs stay coupled too.
        pair = {}

        def kernel_q_init(rng, shape):
            w = nn.initializers.lecun_normal()(rng, shape, jnp.float32)
            wq, scale = quantize_weight(w)
            pair["scale"] = scale
            return wq

        def scale_init(rng, shape):
            return pair["scale"]

        kernel_q = self.param(
            "kernel_q", kernel_q_init, (in_features, self.features)
        )
        scale = self.param("scale", scale_init, (self.features,))
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return dense_int8(x, kernel_q, scale, bias, out_dtype=self.dtype)


def _encoder_dense(cfg: BeitConfig, features: int, use_bias: bool, dtype, name: str):
    """Dense or Int8Dense for encoder projections, per cfg.quant."""
    if cfg.quant == "int8":
        return Int8Dense(features, use_bias=use_bias, dtype=dtype, name=name)
    if cfg.quant != "none":
        raise ValueError(f"unknown BeitConfig.quant: {cfg.quant!r}")
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


class BeitAttention(nn.Module):
    cfg: BeitConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        B, N, H = x.shape
        hd = c.hidden_size // c.num_heads

        # BEiT quirk: q and v carry biases, k does not.
        q = _encoder_dense(c, c.hidden_size, True, self.dtype, "query")(x)
        k = _encoder_dense(c, c.hidden_size, False, self.dtype, "key")(x)
        v = _encoder_dense(c, c.hidden_size, True, self.dtype, "value")(x)

        num_rel = (2 * c.grid - 1) * (2 * c.grid - 1) + 3
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.zeros,
            (num_rel, c.num_heads),
        )
        index = relative_position_index(c.grid)
        bias = table[index.reshape(-1)].reshape(N, N, c.num_heads)

        impl = resolve_attn_impl(c, self.dtype)
        if impl == "pallas":
            # fused kernel: scores never leave VMEM (and are f32 for free),
            # the (hp, N, N) bias block is DMA'd once per head group instead
            # of being broadcast through HBM per batch row. PACKED layout:
            # the kernel reads the q/k/v Dense outputs as-is and slices
            # heads out of lane-aligned blocks — the earlier head-major
            # layout spent 78% of the kernel's runtime on its four
            # (B,N,H)↔(h,B,N,d) transposes per layer (PERF.md round 5).
            from tpu3dlm.ops.pallas.attention import beit_attention_packed

            out = beit_attention_packed(
                q, k, v,
                bias.transpose(2, 0, 1).astype(jnp.float32),
                c.num_heads,
            )
            return _encoder_dense(c, c.hidden_size, True, self.dtype, "output")(out)

        def split(t):
            return t.reshape(B, N, c.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        # scores stay in the compute dtype: on the bf16 fast path the
        # (B, h, N, N) score tensor is the classifier's biggest HBM tenant —
        # keeping it f32 cost 59 ms of 249 at 384 crops on v5e-1 (PERF.md).
        # Softmax still reduces in f32 for stability; the f32 path is
        # unchanged (golden-tested against HF torch).
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)
        attn = attn / jnp.sqrt(hd).astype(attn.dtype)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)

        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, c.hidden_size)
        return _encoder_dense(c, c.hidden_size, True, self.dtype, "output")(out)


class BeitLayer(nn.Module):
    cfg: BeitConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        ls1 = self.param(
            "lambda_1",
            nn.initializers.constant(c.layer_scale_init_value),
            (c.hidden_size,),
        )
        ls2 = self.param(
            "lambda_2",
            nn.initializers.constant(c.layer_scale_init_value),
            (c.hidden_size,),
        )
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="ln1")(x)
        h = BeitAttention(c, dtype=self.dtype, name="attn")(h)
        x = x + ls1 * h
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="ln2")(x)
        h = _encoder_dense(c, c.intermediate_size, True, self.dtype, "fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = _encoder_dense(c, c.hidden_size, True, self.dtype, "fc2")(h)
        return x + ls2 * h


class BeitClassifier(nn.Module):
    """BEiT encoder + mean-pool classification head."""

    cfg: BeitConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels):
        """pixels: (B, H, W, 3) float32, already normalized. → (B, num_labels)."""
        c = self.cfg
        B = pixels.shape[0]
        x = nn.Conv(
            c.hidden_size,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(pixels)
        x = x.reshape(B, -1, c.hidden_size)
        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, c.hidden_size)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, c.hidden_size)).astype(x.dtype), x], axis=1)

        for i in range(c.num_layers):
            x = BeitLayer(c, dtype=self.dtype, name=f"layer{i}")(x)

        if c.use_mean_pooling:
            pooled = x[:, 1:, :].mean(axis=1)
            pooled = nn.LayerNorm(
                epsilon=c.layer_norm_eps, dtype=self.dtype, name="pool_ln"
            )(pooled)
        else:
            x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="final_ln")(x)
            pooled = x[:, 0]
        return nn.Dense(self.cfg.num_labels, dtype=self.dtype, name="classifier")(pooled)


IMAGENET_MEAN = (0.5, 0.5, 0.5)
IMAGENET_STD = (0.5, 0.5, 0.5)


def preprocess_crops(crops: jax.Array) -> jax.Array:
    """uint8 (B, 224, 224, 3) → normalized float32 (BeitImageProcessor parity:
    rescale 1/255 then mean/std 0.5)."""
    x = crops.astype(jnp.float32) / 255.0
    mean = jnp.array(IMAGENET_MEAN, jnp.float32)
    std = jnp.array(IMAGENET_STD, jnp.float32)
    return (x - mean) / std
