"""Fused BEiT attention — Pallas TPU kernel with a broadcast position bias.

The XLA einsum path (models/beit.py) materialises the (B, h, N, N) score
tensor in HBM around the softmax (write + read) and again as the softmax
output feeding the AV matmul — ~1.4 GB of round-trip HBM traffic per layer
at the production crop budget (B=384, N=197, bf16), for a score tensor
whose bias summand is the SAME (h, N, N) array for every batch element.
Stock flash kernels cannot exploit that sharing: `jax.experimental.pallas.
ops.tpu.flash_attention` takes the bias as a (B, h, N, N) operand (`ab`)
and streams it from HBM, which costs exactly the traffic the kernel exists
to avoid (measured 49% slower than the einsum path at N=197, PERF.md
"Fused full step").

This kernel instead:

* keeps each (block_b, N, N) score tile in VMEM — the full score tensor
  never exists in HBM;
* orders the grid head-major, so the (1, N, N) f32 bias block is DMA'd
  once per HEAD (12 fetches of 155 KB), not once per (batch, head);
* computes scores and softmax in f32 *for free* (they are VMEM-resident),
  removing the bf16 fast path's score-rounding drift at bf16 speed — the
  same trick the NN kernel plays with limb decomposition, here the cheaper
  way: the f32 tensor simply never leaves the chip.

At N=197 the whole (q, k, v, bias, scores) working set for a block of
8 batch rows is ~3 MB, so no online-softmax tiling is needed: one program
computes exact attention for its block.

Gradients: `beit_attention` carries a custom VJP whose backward pass
recomputes attention with plain XLA einsums in f32 (standard
flash-attention practice) — finetuning (parallel/finetune.py) works
unchanged when the forward ran the kernel.

Reference semantics being replaced: per-crop torch BEiT self-attention,
/root/reference/src/damage/classifier.py:55-90 (HF BeitSelfAttention with
relative_position_bias).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[:]  # (BB, N, d) compute dtype
    k = k_ref[:]
    v = v_ref[:]
    # scores in f32: VMEM-resident, so the precision upgrade is free
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BB, N, N)
    s = s * scale + bias_ref[:]  # bias block (1, N, N) broadcasts over BB
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BB, N, d)
    o_ref[:] = o.astype(o_ref.dtype)


# Test hook: run the Pallas kernel in interpret mode on non-TPU backends so
# the kernel path (not the einsum twin) can be exercised inside shard_map on
# the virtual CPU mesh (tests/test_parallel.py). Never set in production.
FORCE_INTERPRET = False


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def beit_attention_pallas(
    q: jax.Array,  # (h, B, N, d) — head-major so bias DMAs once per head
    k: jax.Array,  # (h, B, N, d)
    v: jax.Array,  # (h, B, N, d)
    bias: jax.Array,  # (h, N, N) f32 relative-position bias
    block_b: int = 16,
    interpret: bool = False,
) -> jax.Array:  # (h, B, N, d) in q.dtype
    h, B, N, d = q.shape
    scale = 1.0 / math.sqrt(d)
    bb = min(block_b, B)
    pad = (-B) % bb
    if pad:
        # zero-pad rows: scores = bias → softmax is finite, output discarded
        zeros = ((0, 0), (0, pad), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, zeros), jnp.pad(k, zeros), jnp.pad(v, zeros)
    Bp = B + pad
    nb = Bp // bb

    def flat(t):  # (h, Bp, N, d) → (h·Bp, N, d), a free view
        return t.reshape(h * Bp, N, d)

    qkv_spec = pl.BlockSpec(
        (bb, N, d), lambda hi, bi: (hi * nb + bi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        interpret=interpret,
        grid=(h, nb),  # LAST dim iterates fastest → bias constant per sweep
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec(
                (1, N, N), lambda hi, bi: (hi, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((h * Bp, N, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * h * Bp * N * N * d * 2,
            bytes_accessed=(
                4 * h * Bp * N * d * q.dtype.itemsize + h * N * N * 4
            ),
            transcendentals=h * Bp * N * N,
        ),
    )(flat(q), flat(k), flat(v), bias.astype(jnp.float32))
    return out.reshape(h, Bp, N, d)[:, :B]


def _attn_kernel_packed(
    q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float, d: int
):
    """Like _attn_kernel but over PACKED blocks: the last axis carries
    ``hp`` heads of width d side by side (hp·d = 128 lanes for d=64), and
    the bias block carries the matching hp heads. Heads are processed
    sequentially so only one (bb, N, N) f32 score tile is live at a time."""
    hp = q_ref.shape[-1] // d
    for i in range(hp):
        sl = slice(i * d, (i + 1) * d)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = s * scale + bias_ref[i]
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, sl] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "block_b", "interpret")
)
def beit_attention_packed_pallas(
    q: jax.Array,  # (B, N, H) — the RAW q Dense output, H = h·d
    k: jax.Array,  # (B, N, H)
    v: jax.Array,  # (B, N, H)
    bias: jax.Array,  # (h, N, N) f32 relative-position bias
    num_heads: int,
    block_b: int = 16,
    interpret: bool = False,
) -> jax.Array:  # (B, N, H) in q.dtype
    """Packed-layout twin of beit_attention_pallas.

    The head-major kernel needs (B,N,H) → (h,B,N,d) transposes on q/k/v
    and one back on the output — 4 materialised HBM round trips per layer
    that the per-op ledger measured at 78% of the kernel's own runtime
    (PERF.md round 5). Here the kernel reads the Dense outputs AS-IS:
    each program DMAs a (block_b, N, hp·d) slice whose last axis is hp
    consecutive heads (hp = 128 // d keeps blocks lane-aligned), computes
    them sequentially in VMEM, and writes the output back in packed
    layout, ready for the output projection. No transpose ops exist in
    the program at all.
    """
    B, N, H = q.shape
    h = num_heads
    d = H // h
    hp = max(1, 128 // d)
    while h % hp:
        hp -= 1
    scale = 1.0 / math.sqrt(d)
    bb = min(block_b, B)
    pad = (-B) % bb
    if pad:
        zeros = ((0, pad), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, zeros), jnp.pad(k, zeros), jnp.pad(v, zeros)
    Bp = B + pad
    nb = Bp // bb

    qkv_spec = pl.BlockSpec(
        (bb, N, hp * d), lambda hi, bi: (bi, 0, hi),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_attn_kernel_packed, scale=scale, d=d),
        interpret=interpret,
        grid=(h // hp, nb),  # LAST dim fastest → bias constant per sweep
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec(
                (hp, N, N), lambda hi, bi: (hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, N, H), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * h * Bp * N * N * d * 2,
            bytes_accessed=(
                4 * Bp * N * H * q.dtype.itemsize + h * N * N * 4
            ),
            transcendentals=h * Bp * N * N,
        ),
    )(q, k, v, bias.astype(jnp.float32))
    return out[:B]


def beit_attention_packed_reference(
    q: jax.Array, k: jax.Array, v: jax.Array, bias: jax.Array,
    num_heads: int,
) -> jax.Array:
    """XLA twin of the packed kernel with its exact numerics (f32 scores /
    softmax, probabilities cast back for the AV matmul) — backward
    recompute + parity oracle."""
    B, N, H = q.shape
    h = num_heads
    d = H // h
    qh = q.reshape(B, N, h, d)
    kh = k.reshape(B, N, h, d)
    vh = v.reshape(B, N, h, d)
    s = jnp.einsum(
        "bnhd,bmhd->bhnm", qh, kh, preferred_element_type=jnp.float32
    )
    s = s / jnp.float32(math.sqrt(d)) + bias.astype(jnp.float32)[None]
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum(
        "bhnm,bmhd->bnhd", p.astype(vh.dtype), vh,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    return o.reshape(B, N, H)


def _dispatch_packed(q, k, v, bias, num_heads):
    if jax.default_backend() == "tpu":
        return beit_attention_packed_pallas(q, k, v, bias, num_heads)
    if FORCE_INTERPRET:
        return beit_attention_packed_pallas(
            q, k, v, bias, num_heads, interpret=True
        )
    return beit_attention_packed_reference(q, k, v, bias, num_heads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def beit_attention_packed(
    q: jax.Array, k: jax.Array, v: jax.Array, bias: jax.Array,
    num_heads: int,
) -> jax.Array:
    """(B, N, h·d) packed fused attention: Pallas on TPU, einsum elsewhere."""
    return _dispatch_packed(q, k, v, bias, num_heads)


def _beit_attention_packed_fwd(q, k, v, bias, num_heads):
    return _dispatch_packed(q, k, v, bias, num_heads), (q, k, v, bias)


def _beit_attention_packed_bwd(num_heads, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: beit_attention_packed_reference(
            q_, k_, v_, b_, num_heads
        ),
        q, k, v, bias,
    )
    return vjp(g)


beit_attention_packed.defvjp(
    _beit_attention_packed_fwd, _beit_attention_packed_bwd
)


def beit_attention_reference(
    q: jax.Array, k: jax.Array, v: jax.Array, bias: jax.Array
) -> jax.Array:
    """XLA einsum twin with the kernel's exact numerics (f32 scores/softmax,
    probabilities cast back to the compute dtype for the AV matmul). Used as
    the custom-VJP backward recompute and as the parity oracle in tests."""
    h, B, N, d = q.shape
    s = jnp.einsum(
        "hbnd,hbmd->hbnm", q, k, preferred_element_type=jnp.float32
    )
    s = s / jnp.float32(math.sqrt(d)) + bias.astype(jnp.float32)[:, None]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "hbnm,hbmd->hbnd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def _dispatch(q, k, v, bias):
    if jax.default_backend() == "tpu":
        return beit_attention_pallas(q, k, v, bias)
    if FORCE_INTERPRET:
        return beit_attention_pallas(q, k, v, bias, interpret=True)
    return beit_attention_reference(q, k, v, bias)


@jax.custom_vjp
def beit_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, bias: jax.Array
) -> jax.Array:
    """(h, B, N, d) fused attention: Pallas kernel on TPU, einsum elsewhere."""
    return _dispatch(q, k, v, bias)


def _beit_attention_fwd(q, k, v, bias):
    return _dispatch(q, k, v, bias), (q, k, v, bias)


def _beit_attention_bwd(res, g):
    # recompute-based backward through the einsum twin (f32 scores): exact
    # for the reference path, and within f32-softmax round-off of the
    # kernel's forward — the standard flash-attention gradient contract
    q, k, v, bias = res
    _, vjp = jax.vjp(beit_attention_reference, q, k, v, bias)
    return vjp(g)


beit_attention.defvjp(_beit_attention_fwd, _beit_attention_bwd)
