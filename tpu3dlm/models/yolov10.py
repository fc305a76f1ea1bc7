"""YOLOv10 in Flax — NMS-free detection as one XLA graph.

TPU-native replacement for the reference's ultralytics wrapper
(src/detector/detector.py:60, 82-90). The architecture follows the YOLOv10
paper (CSP backbone with SCDown + PSA, PAN neck, decoupled head with DFL
regression and consistent dual assignments); the *one-to-one* head makes
inference NMS-free, which is exactly what a TPU wants: static shapes, no
data-dependent box pruning — `detect()` is a single `jit`-compiled call
returning a fixed (batch, max_det, 6) tensor.

The layer graph is expressed as a spec table (from-index, repeats, module,
args) mirroring the ultralytics yaml, so any finetuned YOLOv10 checkpoint
(e.g. the reference's src/common/finetuned_models/yolov10/best.pt) converts
weight-for-weight via models/weights.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpu3dlm.models import layers as L

REG_MAX = 16
STRIDES = (8, 16, 32)

# (from, repeats, module, args) — ultralytics yolov10{n,s} yaml layout.
# Concat is implicit via tuple "from"; Upsample is the string "up".
_SPEC_V10 = [
    # backbone
    (-1, 1, "Conv", (64, 3, 2)),  # 0  P1/2
    (-1, 1, "Conv", (128, 3, 2)),  # 1  P2/4
    (-1, 3, "C2f", (128, True)),  # 2
    (-1, 1, "Conv", (256, 3, 2)),  # 3  P3/8
    (-1, 6, "C2f", (256, True)),  # 4
    (-1, 1, "SCDown", (512, 3, 2)),  # 5  P4/16
    (-1, 6, "C2f", (512, True)),  # 6
    (-1, 1, "SCDown", (1024, 3, 2)),  # 7  P5/32
    (-1, 3, "C2f", (1024, True)),  # 8   (C2fCIB for s/m/l/x — see variants)
    (-1, 1, "SPPF", (1024, 5)),  # 9
    (-1, 1, "PSA", (1024,)),  # 10
    # head (PAN)
    (-1, 1, "up", ()),  # 11
    ((-1, 6), 1, "concat", ()),  # 12
    (-1, 3, "C2f", (512,)),  # 13
    (-1, 1, "up", ()),  # 14
    ((-1, 4), 1, "concat", ()),  # 15
    (-1, 3, "C2f", (256,)),  # 16  P3 out
    (-1, 1, "Conv", (256, 3, 2)),  # 17
    ((-1, 13), 1, "concat", ()),  # 18
    (-1, 3, "C2f", (512,)),  # 19  P4 out
    (-1, 1, "SCDown", (512, 3, 2)),  # 20
    ((-1, 10), 1, "concat", ()),  # 21
    (-1, 3, "C2fCIB", (1024, True, True)),  # 22  P5 out
]
_DETECT_FROM = (16, 19, 22)

# scale: (depth_multiple, width_multiple, max_channels)
_VARIANTS = {
    "n": (1 / 3, 0.25, 1024),
    "s": (1 / 3, 0.50, 1024),
    "m": (2 / 3, 0.75, 768),
    "b": (2 / 3, 1.0, 512),
    "l": (1.0, 1.0, 512),
    "x": (1.0, 1.25, 512),
}

# Per-variant module overrides (layer index → (module, args)) following the
# ultralytics yolov10{n..x} yamls' rank-guided CIB placement: the base spec
# above is the n layout; s swaps backbone layer 8 to a LONG-KERNEL C2fCIB;
# m/b/l use C2fCIB (no long kernel — the paper reserves large-kernel
# depthwise convs for the small scales) at layers 8, 19 and 22; x
# additionally at backbone 6 and head 13. The CI golden against the real
# ultralytics package (tests/test_models.py) arbitrates this table.
_M_OVERRIDES = {
    8: ("C2fCIB", (1024, True)),
    19: ("C2fCIB", (512, True)),
    22: ("C2fCIB", (1024, True)),
}
_CIB_OVERRIDES: dict[str, dict[int, tuple[str, tuple]]] = {
    "n": {},
    "s": {8: ("C2fCIB", (1024, True, True))},
    "m": dict(_M_OVERRIDES),
    "b": dict(_M_OVERRIDES),
    "l": dict(_M_OVERRIDES),
    "x": {
        **_M_OVERRIDES,
        6: ("C2fCIB", (512, True)),
        13: ("C2fCIB", (512, True)),
    },
}


@dataclasses.dataclass(frozen=True)
class YoloVariant:
    depth: float
    width: float
    max_channels: int


def yolov10_variant(name: str) -> YoloVariant:
    return YoloVariant(*_VARIANTS[name])


def spec_for_variant(name: str) -> list:
    """The layer spec with the variant's CIB overrides applied — the single
    source of truth for both the Flax model and the torch test reference."""
    spec = list(_SPEC_V10)
    for idx, (mod, args) in _CIB_OVERRIDES[name].items():
        frm, n, _, _ = spec[idx]
        spec[idx] = (frm, n, mod, args)
    return spec


class DetectBranch(nn.Module):
    """One head (box regression + lightweight classification) over 3 scales."""

    nc: int
    channels: Sequence[int]  # feature channels of P3/P4/P5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c2 = max(16, self.channels[0] // 4, REG_MAX * 4)
        c3 = max(self.channels[0], min(self.nc, 100))
        outs = []
        for i, x in enumerate(feats):
            box = L.ConvBN(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            box = L.ConvBN(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(box, train)
            box = nn.Conv(4 * REG_MAX, (1, 1), dtype=self.dtype, name=f"cv2_{i}_2")(box)

            ci = x.shape[-1]
            cls = L.ConvBN(ci, 3, groups=ci, dtype=self.dtype, name=f"cv3_{i}_0_0")(x, train)
            cls = L.ConvBN(c3, 1, dtype=self.dtype, name=f"cv3_{i}_0_1")(cls, train)
            cls = L.ConvBN(c3, 3, groups=c3, dtype=self.dtype, name=f"cv3_{i}_1_0")(cls, train)
            cls = L.ConvBN(c3, 1, dtype=self.dtype, name=f"cv3_{i}_1_1")(cls, train)
            cls = nn.Conv(self.nc, (1, 1), dtype=self.dtype, name=f"cv3_{i}_2")(cls)

            outs.append((box, cls))
        return outs


def space_to_depth(x: jax.Array, block: int = 2) -> jax.Array:
    """(B, H, W, C) → (B, H/b, W/b, C·b²): fold spatial blocks into channels.

    MXU-utilisation lever for the stem: a stride-2 3×3 conv on 3 input
    channels packs the 128-wide MXU contraction at 27/128; folding 2×2
    blocks first gives 12 input channels (108/128 with the 3×3 window).
    The stride-1 conv then covers a 6×6-pixel receptive field and costs
    4× the stem FLOPs — but the stem is ~1% of the network, so the trade
    is +~4% model FLOPs for a 4×-denser MXU contraction (accept/reject
    decided by measurement, PERF.md "MXU utilisation" section).
    """
    B, H, W, C = x.shape
    x = x.reshape(B, H // block, block, W // block, block, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        B, H // block, W // block, C * block * block
    )


class YOLOv10(nn.Module):
    """YOLOv10 detector. Returns raw per-scale maps for both heads.

    ``stem="s2d"`` replaces the stride-2 stem conv with space-to-depth +
    stride-1 conv (same receptive field / output shape, better MXU channel
    packing — PERF.md utilisation experiments). Checkpoint-converted
    weights require the default ``stem="conv"`` layout.
    """

    nc: int = 80
    variant: str = "n"
    dtype: Any = jnp.float32
    stem: str = "conv"

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 3) float32 in [0, 1] → dict of head outputs."""
        v = yolov10_variant(self.variant)
        ch = partial(L.scale_channels, width=v.width, max_channels=v.max_channels)
        dp = partial(L.scale_depth, depth=v.depth)
        dt = self.dtype

        outputs: list[jax.Array] = []
        for i, (frm, n, mod, args) in enumerate(spec_for_variant(self.variant)):
            if mod == "concat":
                inp = jnp.concatenate([outputs[j] for j in frm], axis=-1)
                outputs.append(inp)
                continue
            inp = outputs[frm] if outputs else x
            name = f"m{i}"
            if mod == "up":
                y = L.upsample2x(inp)
            elif mod == "Conv":
                if i == 0 and self.stem == "s2d":
                    y = L.ConvBN(ch(args[0]), args[1], 1, dtype=dt, name=name)(
                        space_to_depth(inp, args[2]), train
                    )
                else:
                    y = L.ConvBN(ch(args[0]), args[1], args[2], dtype=dt, name=name)(inp, train)
            elif mod == "C2f":
                y = L.C2f(
                    ch(args[0]), dp(n), shortcut=bool(args[1]) if len(args) > 1 else False,
                    dtype=dt, name=name,
                )(inp, train)
            elif mod == "SCDown":
                y = L.SCDown(ch(args[0]), args[1], args[2], dtype=dt, name=name)(inp, train)
            elif mod == "SPPF":
                y = L.SPPF(ch(args[0]), args[1], dtype=dt, name=name)(inp, train)
            elif mod == "PSA":
                y = L.PSA(ch(args[0]), dtype=dt, name=name)(inp, train)
            elif mod == "C2fCIB":
                y = L.C2fCIB(
                    ch(args[0]), dp(n), shortcut=bool(args[1]),
                    long_kernel=bool(args[2]) if len(args) > 2 else False,
                    dtype=dt, name=name,
                )(inp, train)
            else:
                raise ValueError(f"unknown module {mod}")
            outputs.append(y)

        feats = [outputs[j] for j in _DETECT_FROM]
        channels = tuple(f.shape[-1] for f in feats)
        o2m_split = DetectBranch(self.nc, channels, dtype=dt, name="detect_o2m")(feats, train)
        o2o_split = DetectBranch(self.nc, channels, dtype=dt, name="detect_o2o")(
            [jax.lax.stop_gradient(f) if train else f for f in feats], train
        )
        # "one2one"/"one2many": the concatenated per-level maps (the
        # ultralytics-parity raw format every existing consumer knows).
        # "*_split": the same tensors BEFORE the box/cls concat — the
        # serving postprocess consumes these, and XLA then dead-code-
        # eliminates the concats entirely (the per-op ledger charged the
        # o2o concat 3.1% of device time just to be sliced apart again).
        cat = lambda split: [jnp.concatenate([b, c], axis=-1) for b, c in split]  # noqa: E731
        return {
            "one2many": cat(o2m_split),
            "one2one": cat(o2o_split),
            "one2many_split": o2m_split,
            "one2one_split": o2o_split,
        }


# ---------------------------------------------------------------------------
# Decode + NMS-free postprocess (pure functions, jit-safe)
# ---------------------------------------------------------------------------


def make_anchors(img_size: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Anchor centre points and per-anchor stride for all scales.

    Returns (anchors (A, 2) in feature-cell units scaled later, strides (A,)).
    """
    if img_size % 32:
        # strided convs produce ceil(H/2) feature maps while this grid uses
        # floor division — a non-multiple would surface as a cryptic
        # broadcast error deep inside jit instead of here
        raise ValueError(f"img_size must be a multiple of 32, got {img_size}")
    pts, strs = [], []
    for s in STRIDES:
        h = w = img_size // s
        ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
        xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
        pts.append(jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1))
        strs.append(jnp.full((h * w,), float(s)))
    return jnp.concatenate(pts), jnp.concatenate(strs)


def decode_raw(raw: Sequence[jax.Array], img_size: int) -> tuple[jax.Array, jax.Array]:
    """Per-scale raw maps → (boxes_xyxy (B, A, 4) px, cls_logits (B, A, nc)).

    DFL: softmax over REG_MAX bins → expected offset per side (l, t, r, b) in
    stride units; box = anchor ∓ offsets, scaled by stride.
    """
    B = raw[0].shape[0]
    flat = jnp.concatenate([r.reshape(B, -1, r.shape[-1]) for r in raw], axis=1)
    box_logits = flat[..., : 4 * REG_MAX].reshape(B, -1, 4, REG_MAX)
    cls_logits = flat[..., 4 * REG_MAX :]

    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    dist = jnp.einsum(
        "band,d->ban", jax.nn.softmax(box_logits.astype(jnp.float32), axis=-1), bins,
        precision=jax.lax.Precision.HIGHEST,  # sub-pixel box decode, not model math
    )  # (B, A, 4) — l, t, r, b

    anchors, strides = make_anchors(img_size)
    x1y1 = (anchors[None] - dist[..., :2]) * strides[None, :, None]
    x2y2 = (anchors[None] + dist[..., 2:]) * strides[None, :, None]
    boxes = jnp.concatenate([x1y1, x2y2], axis=-1)
    return boxes, cls_logits


@partial(jax.jit, static_argnames=("img_size", "max_det", "per_level"))
def postprocess(
    raw_one2one: Sequence[jax.Array],
    img_size: int,
    max_det: int = 300,
    per_level: bool = True,
) -> dict[str, jax.Array]:
    """NMS-free selection from the one-to-one head.

    Per anchor: max class prob + argmax label; top-`max_det` anchors by
    confidence. Static output shapes: boxes (B, D, 4), conf (B, D),
    label (B, D). Caller thresholds by conf (reference conf_thresh).

    ``per_level=True`` (round 4): reductions run PER FPN LEVEL before any
    concatenation. The original path concatenated the three raw maps into
    one (B, A, 4·REG_MAX + nc) tensor just to slice it apart again — at
    batch 256 / 640² that materialises ~620 MB (bf16) through HBM, and
    the per-op ledger charged the postprocess/detect concats 5.8% of
    device time (PERF.md round 5). Per-level, only the reduced (B, A, 4)
    boxes and (B, A) conf/label concatenate (~24× less concat traffic).
    Outputs are bit-identical — same level-major anchor order, same math
    (pinned in tests/test_models.py) — so False exists purely as the A/B
    baseline.

    ``raw_one2one`` accepts either the concatenated per-level maps
    (``model outputs["one2one"]``) or the pre-concat (box, cls) tuples
    (``outputs["one2one_split"]``). Serving paths pass the SPLIT form so
    XLA dead-code-eliminates the head's box/cls concat as well (another
    ~3% of device self-time in the ledger); both forms produce identical
    results.
    """
    split_in = isinstance(raw_one2one[0], (tuple, list))
    if not per_level:
        if split_in:  # decode_raw wants the concatenated maps
            raw_one2one = [jnp.concatenate([b, c], axis=-1) for b, c in raw_one2one]
        boxes, cls_logits = decode_raw(raw_one2one, img_size)
        probs = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
        conf = probs.max(axis=-1)
        label = probs.argmax(axis=-1).astype(jnp.int32)
    else:
        if img_size % 32:
            raise ValueError(f"img_size must be a multiple of 32, got {img_size}")
        bins = jnp.arange(REG_MAX, dtype=jnp.float32)
        conf_l, label_l, boxes_l = [], [], []
        for r, s in zip(raw_one2one, STRIDES):
            if split_in:
                box_map, cls_map = r
                B = box_map.shape[0]
                box_logits = box_map.reshape(B, -1, 4, REG_MAX)
                cls_logits = cls_map.reshape(B, box_logits.shape[1], -1)
                n = box_logits.shape[1]
            else:
                B = r.shape[0]
                flat = r.reshape(B, -1, r.shape[-1])
                n = flat.shape[1]
                box_logits = flat[..., : 4 * REG_MAX].reshape(B, n, 4, REG_MAX)
                cls_logits = flat[..., 4 * REG_MAX :]
            # sigmoid is monotone increasing, so max/argmax commute with it:
            # reduce the raw logits first and apply ONE sigmoid to the (B, n)
            # winners instead of materialising sigmoid over all nc classes —
            # bit-identical (same winning logit value, same tie order;
            # pinned against the per_level=False path in tests)
            logits32 = cls_logits.astype(jnp.float32)
            conf_l.append(jax.nn.sigmoid(logits32.max(axis=-1)))
            label_l.append(logits32.argmax(axis=-1).astype(jnp.int32))
            dist = jnp.einsum(
                "band,d->ban",
                jax.nn.softmax(box_logits.astype(jnp.float32), axis=-1),
                bins,
                precision=jax.lax.Precision.HIGHEST,  # sub-pixel box decode
            )
            h = w = img_size // s
            ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
            xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
            a = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
            x1y1 = (a[None] - dist[..., :2]) * float(s)
            x2y2 = (a[None] + dist[..., 2:]) * float(s)
            boxes_l.append(jnp.concatenate([x1y1, x2y2], axis=-1))
        conf = jnp.concatenate(conf_l, axis=1)
        label = jnp.concatenate(label_l, axis=1)
        boxes = jnp.concatenate(boxes_l, axis=1)
    k = min(max_det, boxes.shape[1])
    top_conf, idx = jax.lax.top_k(conf, k)
    top_boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    top_label = jnp.take_along_axis(label, idx, axis=1)
    return {"boxes": top_boxes, "conf": top_conf, "label": top_label}
