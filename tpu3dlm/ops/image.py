"""Image ops in pure JAX: bilinear resize, crop-rectification, homography warp.

Replaces the reference's per-box OpenCV homography rectification
(src/detector/detector.py:197-231: findHomography from the bbox corners to
the full image corners + warpPerspective, one cv2 call per box per frame).
For axis-aligned boxes that homography reduces to a crop+resize; we provide
both the closed-form 4-point homography solve (`solve_homography_4pt`) and a
vmapped bilinear rectifier (`rectify_crops`) that processes every box of
every frame in one fused device kernel — gathers on the VPU instead of a
host loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def bilinear_sample(image: jax.Array, xs: jax.Array, ys: jax.Array) -> jax.Array:
    """Sample image (H, W, C) at float pixel coords (clamped to edge).

    xs/ys: (...,) → returns (..., C).
    """
    H, W = image.shape[0], image.shape[1]
    x = jnp.clip(xs, 0.0, W - 1.0)
    y = jnp.clip(ys, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = (x - x0.astype(x.dtype))[..., None]
    fy = (y - y0.astype(y.dtype))[..., None]
    img = image.astype(jnp.float32)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def resize_bilinear(image: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """(H, W, C) → (h, w, C) bilinear resize (align-corners=False, cv2-like)."""
    h, w = out_hw
    H, W = image.shape[0], image.shape[1]
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * (H / h) - 0.5
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * (W / w) - 0.5
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return bilinear_sample(image, xx, yy)


def solve_homography_4pt(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Closed-form homography from 4 point correspondences (DLT, 8×8 solve).

    src, dst: (4, 2). Returns 3×3 H with H[2,2] = 1 mapping src → dst.
    """
    def rows(s, d):
        x, y = s[0], s[1]
        u, v = d[0], d[1]
        r1 = jnp.array([x, y, 1.0, 0.0, 0.0, 0.0, -u * x, -u * y])
        r2 = jnp.array([0.0, 0.0, 0.0, x, y, 1.0, -v * x, -v * y])
        return jnp.stack([r1, r2]), jnp.stack([u, v])

    A_rows, b_rows = jax.vmap(rows)(src, dst)
    A = A_rows.reshape(8, 8)
    b = b_rows.reshape(8)
    h = jnp.linalg.solve(A, b)
    return jnp.concatenate([h, jnp.ones(1, h.dtype)]).reshape(3, 3)


def warp_homography(
    image: jax.Array, Hmat: jax.Array, out_hw: tuple[int, int]
) -> jax.Array:
    """Inverse-warp: dst pixel (u, v) sampled at src = H^-1 (u, v, 1)."""
    h, w = out_hw
    Hinv = jnp.linalg.inv(Hmat)
    us = jnp.arange(w, dtype=jnp.float32)
    vs = jnp.arange(h, dtype=jnp.float32)
    vv, uu = jnp.meshgrid(vs, us, indexing="ij")
    ones = jnp.ones_like(uu)
    # pixel COORDINATES (~hundreds): one bf16 MXU pass would round the
    # warp grid by ~2 px (ops/geometry.PRECISE rationale)
    pts = jnp.matmul(jnp.stack([uu, vv, ones], axis=-1), Hinv.T,
                     precision=jax.lax.Precision.HIGHEST)
    xs = pts[..., 0] / pts[..., 2]
    ys = pts[..., 1] / pts[..., 2]
    return bilinear_sample(image, xs, ys)


def _rectify_one(image: jax.Array, bbox: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Rectify one bbox to (h, w): the reference's box→full-image homography
    (detector.py:202-221) specialised to its axis-aligned case — a bilinear
    crop-resize with inclusive corner mapping (matches warpPerspective's
    corner-to-corner correspondence)."""
    h, w = out_hw
    x1, y1, x2, y2 = bbox[0], bbox[1], bbox[2], bbox[3]
    us = jnp.linspace(0.0, 1.0, w)
    vs = jnp.linspace(0.0, 1.0, h)
    vv, uu = jnp.meshgrid(vs, us, indexing="ij")
    xs = x1 + uu * (x2 - x1)
    ys = y1 + vv * (y2 - y1)
    return bilinear_sample(image, xs, ys)


def letterbox(image: jax.Array, size: int, fill: float = 114.0):
    """Aspect-preserving resize + centre pad to (size, size) — the
    ultralytics input convention, needed for converted finetuned checkpoints
    to see their training distribution.

    Returns (canvas (size, size, C), scale, (pad_x, pad_y)). Shapes are
    static (H, W known at trace time) so this jits cleanly.
    """
    H, W = image.shape[0], image.shape[1]
    scale = min(size / H, size / W)
    nh, nw = int(round(H * scale)), int(round(W * scale))
    resized = resize_bilinear(image, (nh, nw))
    pad_y, pad_x = (size - nh) // 2, (size - nw) // 2
    canvas = jnp.full((size, size, image.shape[2]), fill, resized.dtype)
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (pad_y, pad_x, 0))
    return canvas, scale, (pad_x, pad_y)


@partial(jax.jit, static_argnames=("out_hw",))
def rectify_crops(
    images: jax.Array,  # (F, H, W, C)
    boxes: jax.Array,  # (F, B, 4) in image pixels
    out_hw: tuple[int, int] = (224, 224),
) -> jax.Array:
    """All frames × boxes → (F, B, h, w, C) rectified crops, one kernel."""
    per_frame = jax.vmap(_rectify_one, in_axes=(None, 0, None))
    return jax.vmap(per_frame, in_axes=(0, 0, None))(images, boxes, out_hw)


def _interp_matrix(lo: jax.Array, hi: jax.Array, n_out: int, n_in: int) -> jax.Array:
    """(n_out, n_in) linear-interpolation weights sampling [lo, hi] inclusive.

    Row o holds the hat-function weights of source position
    lo + o/(n_out-1)·(hi-lo): at most two nonzeros per row — but built dense
    so the resample becomes a matmul (MXU) instead of a gather (VPU-hostile).
    """
    o = jnp.arange(n_out, dtype=jnp.float32) / max(n_out - 1, 1)
    src = jnp.clip(lo + o * (hi - lo), 0.0, n_in - 1.0)  # (n_out,)
    i = jax.lax.broadcasted_iota(jnp.float32, (n_out, n_in), 1)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - i))


def _rectify_one_mxu(image: jax.Array, bbox: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Separable crop-resize as two matmuls: crop = Wy · img · Wxᵀ.

    Same sample positions as `_rectify_one` (inclusive corner mapping), but
    the resample rides the MXU — on TPU the dense (out, in) weight matmul
    beats 50M scattered gathers by orders of magnitude.
    """
    h, w = out_hw
    H, W, C = image.shape
    Wy = _interp_matrix(bbox[1], bbox[3], h, H)  # (h, H)
    Wx = _interp_matrix(bbox[0], bbox[2], w, W)  # (w, W)
    img = image.astype(jnp.float32)
    tmp = jnp.einsum("oH,HWC->oWC", Wy, img, preferred_element_type=jnp.float32)
    return jnp.einsum("pW,oWC->opC", Wx, tmp, preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("out_hw",))
def rectify_crops_mxu(
    images: jax.Array,  # (F, H, W, C)
    boxes: jax.Array,  # (F, B, 4)
    out_hw: tuple[int, int] = (224, 224),
) -> jax.Array:
    """MXU-matmul rectifier — drop-in for `rectify_crops` on TPU hot paths."""
    per_frame = jax.vmap(_rectify_one_mxu, in_axes=(None, 0, None))
    return jax.vmap(per_frame, in_axes=(0, 0, None))(images, boxes, out_hw)
