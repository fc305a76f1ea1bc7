"""Batched, in-jit detection augmentation for native finetuning.

The reference's checkpoints come from an ultralytics training run whose
augmentation stack (horizontal flip, HSV jitter, scale/crop) runs in a
torch DataLoader on the host (external to the reference snapshot —
SURVEY.md §2b ``finetuned_models``).  Here the same augmentation classes
are pure JAX ops applied INSIDE the jitted train step — TPU-first: the
crop-zoom resample rides the MXU via the same separable interpolation
matmuls as the crop rectifier (ops/image._rectify_one_mxu), box
coordinates transform analytically, and every random draw is a per-sample
``jax.random`` split so a step is a pure function of (params, batch, key).

All ops preserve static shapes: boxes that leave the view after a crop are
masked out, never dropped.  Images are float32 in [0, 1], boxes are
``(B, 4)`` xyxy in stored-frame pixels, exactly as
``pipeline/selftrain.yolo_training_arrays`` produces them.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpu3dlm.ops.image import _rectify_one_mxu


def _hflip(key, img, boxes, p: float):
    """Random horizontal flip; boxes mirror in x (coordinate span S-1)."""
    do = jax.random.bernoulli(key, p)
    S = img.shape[1]
    flipped = img[:, ::-1, :]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    fb = jnp.stack([(S - 1.0) - x2, y1, (S - 1.0) - x1, y2], axis=-1)
    return (
        jnp.where(do, flipped, img),
        jnp.where(do, fb, boxes),
    )


def _color_jitter(key, img, brightness: float, contrast: float):
    """Brightness shift + contrast scale about the per-image mean."""
    kb, kc = jax.random.split(key)
    b = jax.random.uniform(kb, (), minval=-brightness, maxval=brightness)
    c = jax.random.uniform(kc, (), minval=1.0 - contrast, maxval=1.0 + contrast)
    m = img.mean()
    return jnp.clip((img + b - m) * c + m, 0.0, 1.0)


def _crop_zoom(key, img, boxes, mask, p: float, zoom_min: float):
    """Random crop-zoom: resample a sub-window back to full size (MXU
    matmuls), map boxes analytically, mask boxes that left the view.

    The window is drawn in the rectifier's inclusive-corner pixel space
    (span ``S-1``), so ``zoom == 1`` with zero offset is the exact
    identity mapping and the un-zoomed branch of the select is bit-equal
    to the input.
    """
    kd, kz, kx, ky = jax.random.split(key, 4)
    do = jax.random.bernoulli(kd, p)
    S = img.shape[0]
    span = S - 1.0
    z = jax.random.uniform(kz, (), minval=zoom_min, maxval=1.0)
    z = jnp.where(do, z, 1.0)
    we = z * span  # window extent in inclusive-corner coords
    ox = jax.random.uniform(kx, ()) * (span - we)
    oy = jax.random.uniform(ky, ()) * (span - we)
    window = jnp.stack([ox, oy, ox + we, oy + we])
    zoomed = _rectify_one_mxu(img, window, (S, S))
    img = jnp.where(do, zoomed, img)

    scale = span / jnp.maximum(we, 1e-6)
    nb = jnp.stack(
        [
            (boxes[:, 0] - ox) * scale,
            (boxes[:, 1] - oy) * scale,
            (boxes[:, 2] - ox) * scale,
            (boxes[:, 3] - oy) * scale,
        ],
        axis=-1,
    )
    clipped = jnp.clip(nb, 0.0, span)
    # a gt box must stay meaningfully visible after the crop, else mask it
    vis_w = clipped[:, 2] - clipped[:, 0]
    vis_h = clipped[:, 3] - clipped[:, 1]
    visible = (vis_w >= 2.0) & (vis_h >= 2.0)
    boxes = jnp.where(do, clipped, boxes)
    mask = jnp.where(do, mask & visible, mask)
    return img, boxes, mask


def _erase_one(key, img, max_frac: float):
    """One random-erase rectangle: a uniformly-colored patch drawn over the
    image (boxes untouched — the detector must still predict the object
    under partial cover, which is exactly the occlusion-axis failure mode
    the hard-eval corpus stresses)."""
    kx, ky, kw, kh, kc = jax.random.split(key, 5)
    S = img.shape[0]
    w = jax.random.uniform(kw, (), minval=0.08, maxval=max_frac) * S
    h = jax.random.uniform(kh, (), minval=0.08, maxval=max_frac) * S
    x0 = jax.random.uniform(kx, ()) * (S - w)
    y0 = jax.random.uniform(ky, ()) * (S - h)
    color = jax.random.uniform(kc, (3,))
    xs = jnp.arange(S, dtype=jnp.float32)[None, :, None]
    ys = jnp.arange(S, dtype=jnp.float32)[:, None, None]
    inside = (xs >= x0) & (xs < x0 + w) & (ys >= y0) & (ys < y0 + h)
    return jnp.where(inside, color[None, None, :], img)


def _erase(key, img, p: float, count: int, max_frac: float):
    """Up to ``count`` independent erase patches, each applied with
    probability ``p`` (static unroll — count is a compile-time constant)."""
    for i in range(count):
        kd, ke, key = jax.random.split(jax.random.fold_in(key, i), 3)
        do = jax.random.bernoulli(kd, p)
        img = jnp.where(do, _erase_one(ke, img, max_frac), img)
    return img


def _augment_one(
    key,
    img,
    boxes,
    mask,
    *,
    hflip_p: float,
    brightness: float,
    contrast: float,
    zoom_p: float,
    zoom_min: float,
    erase_p: float,
    erase_count: int,
    erase_max: float,
):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    img, boxes = _hflip(k1, img, boxes, hflip_p)
    img = _color_jitter(k2, img, brightness, contrast)
    img, boxes, mask = _crop_zoom(k3, img, boxes, mask, zoom_p, zoom_min)
    if erase_p > 0.0:
        img = _erase(k4, img, erase_p, erase_count, erase_max)
    return img, boxes, mask


def _augment_crop_one(
    key,
    crop_u8,
    *,
    gain_lo: float,
    gain_hi: float,
    offset: float,
    hflip_p: float,
    erase_p: float,
    erase_max: float,
):
    kg, ko, kf, ke, kd = jax.random.split(key, 5)
    x = crop_u8.astype(jnp.float32)
    # log-uniform gain covers dark and bright shifts symmetrically — the
    # damage stress eval's exposure axis (hardeval._perturb_scan_rgb)
    # draws gains in [0.4, 0.55] ∪ [1.5, 1.8]; training must cover it
    g = jnp.exp(
        jax.random.uniform(
            kg, (), minval=jnp.log(gain_lo), maxval=jnp.log(gain_hi)
        )
    )
    x = x * g + jax.random.uniform(ko, (), minval=-offset, maxval=offset)
    x = jnp.clip(x, 0.0, 255.0)
    do_f = jax.random.bernoulli(kf, hflip_p)
    x = jnp.where(do_f, x[:, ::-1, :], x)
    do_e = jax.random.bernoulli(kd, erase_p)
    x01 = _erase_one(ke, x / 255.0, erase_max) * 255.0
    x = jnp.where(do_e, x01, x)
    return jnp.round(x).astype(jnp.uint8)


def augment_crop_batch(
    key: jax.Array,
    crops_u8: jax.Array,  # (N, S, S, 3) uint8
    *,
    gain_lo: float = 0.4,
    gain_hi: float = 1.8,
    offset: float = 25.0,
    hflip_p: float = 0.5,
    erase_p: float = 0.5,
    erase_max: float = 0.45,
) -> jax.Array:
    """Classifier-crop augmentation (round 5): per-crop exposure
    gain/offset jitter spanning the stress eval's dark/bright range,
    horizontal flip, and a random erase patch (partial-occlusion sim).
    uint8 in, uint8 out; safe inside jit/shard_map."""
    keys = jax.random.split(key, crops_u8.shape[0])
    fn = partial(
        _augment_crop_one,
        gain_lo=gain_lo,
        gain_hi=gain_hi,
        offset=offset,
        hflip_p=hflip_p,
        erase_p=erase_p,
        erase_max=erase_max,
    )
    return jax.vmap(fn)(keys, crops_u8)


def augment_detection_batch(
    key: jax.Array,
    images: jax.Array,  # (F, S, S, 3) float32 in [0, 1]
    boxes: jax.Array,  # (F, B, 4) xyxy stored-frame pixels
    mask: jax.Array,  # (F, B) bool
    *,
    hflip_p: float = 0.5,
    brightness: float = 0.2,
    contrast: float = 0.2,
    zoom_p: float = 0.5,
    zoom_min: float = 0.7,
    erase_p: float = 0.0,
    erase_count: int = 2,
    erase_max: float = 0.35,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-sample random flip + color jitter + MXU crop-zoom + optional
    random erasing (off by default — the round-4 fixture checkpoints were
    trained without it; the round-5 hard-eval recipe enables it as the
    occlusion-robustness augmentation).

    Returns (images, boxes, mask) with identical shapes; labels are
    untouched by construction (pass them through unchanged).  Safe inside
    ``jit``/``shard_map`` — probabilities are static, randomness flows
    from ``key`` only.
    """
    keys = jax.random.split(key, images.shape[0])
    fn = partial(
        _augment_one,
        hflip_p=hflip_p,
        brightness=brightness,
        contrast=contrast,
        zoom_p=zoom_p,
        zoom_min=zoom_min,
        erase_p=erase_p,
        erase_count=erase_count,
        erase_max=erase_max,
    )
    return jax.vmap(fn)(keys, images, boxes, mask)
