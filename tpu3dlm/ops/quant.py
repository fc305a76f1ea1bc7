"""Int8 post-training quantization for the MXU.

v5e's MXU runs int8×int8→int32 at 2× its bf16 FLOP rate (394 TOPS vs
197 TFLOP/s), so for MXU-bound programs — BEiT-base at production crop
counts sits at ~40% bf16 MFU — weight+activation int8 is the one remaining
2×-class lever. This module is the TPU-native recipe (the same shape AQT
uses): symmetric per-output-channel weight scales computed offline,
symmetric per-row dynamic activation scales computed in-graph, and
``lax.dot_general`` with int8 operands + ``preferred_element_type=int32``
so XLA lowers straight onto the int8 MXU path.

The reference has no quantized path (torch fp32 per-crop loops,
src/damage/classifier.py:55-90); this is a framework addition for
production serving, gated by config ``beit_quant = int8`` and held to a
measured top-1-agreement bar (tests/test_quant.py, PERF.md).

Why symmetric/per-channel/per-row and not fancier:
- per-OUTPUT-channel weight scales commute with the contraction, so
  dequantization is a cheap rank-1 rescale of the int32 accumulator;
- per-row (token) activation scales cost one VPU amax over the feature
  axis — noise-floor next to the matmul they feed — and track the wide
  dynamic range across tokens that a per-tensor scale would flatten;
- symmetric (no zero-points) keeps the MXU product a plain dot; BEiT's
  pre-GELU/post-LayerNorm activations are near-zero-mean, so asymmetry
  buys nothing measurable at 8 bits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_QMAX = 127.0
_EPS = 1e-12


def quantize_weight(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(in, out) float kernel → (int8 kernel, (out,) f32 scale).

    Symmetric per-output-channel: scale = amax(|w|, axis=in)/127. A dead
    column (all zeros) gets scale eps/127 so dequant stays finite.
    """
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(w), axis=0), _EPS)
    scale = amax / _QMAX
    wq = jnp.clip(jnp.round(w / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return wq, scale


def quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., in) float activations → (int8, (..., 1) f32 per-row scale)."""
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), _EPS)
    scale = amax / _QMAX
    xq = jnp.clip(jnp.round(xf / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return xq, scale


def int8_matmul(
    xq: jax.Array, wq: jax.Array, x_scale: jax.Array, w_scale: jax.Array
) -> jax.Array:
    """int8 (..., in) @ int8 (in, out) → f32 (..., out), MXU int32 path.

    ``preferred_element_type=int32`` is the contract that keeps the MXU in
    int8 mode; accumulating in int8 would overflow at in>128 and float
    accumulation would silently fall back to the bf16 pipeline.
    """
    acc = jax.lax.dot_general(
        xq,
        wq,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * x_scale * w_scale


def dense_int8(x: jax.Array, wq, w_scale, bias=None, out_dtype=None):
    """Drop-in quantized Dense forward: dynamic per-row activation quant,
    int8 MXU matmul, f32 dequant (+bias), cast to ``out_dtype`` (defaults
    to x.dtype so it composes with bf16 models)."""
    xq, xs = quantize_rows(x)
    y = int8_matmul(xq, wq, xs, w_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)
