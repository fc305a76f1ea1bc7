"""Shape bucketing for serving: pad varying per-capture axes to a small
set of static sizes so long-lived processes never retrace.

Every capture arrives with its own frame count and box count; XLA compiles
one program per distinct input shape, and over a remote-compile runtime
(axon tunnel: minutes per fresh program) a per-capture retrace erases the
entire throughput win. The pipeline therefore pads shape-bearing axes up
to a bucket and masks/trims the padding:

- frames (F) in 3D NMS and the staged projection — padded frames carry
  ``mask=False`` so they can neither produce nor suppress boxes;
- assignment problems (n, m) in box comparison — padded pairs cost
  ``inf`` (forbidden), so padded rows take their unmatch slack and padded
  columns can only be absorbed by the solver's dummy class;
- ICP targets use far-sentinel padding (ops/icp.pad_target_bucket).

All of these are EXACT: the padding is constructed so it cannot interact
with real entries (reference behavior: per-capture dynamic shapes
throughout, e.g. src/mapper/pose_processor.py:93's frame-at-a-time loop —
a host-loop design with no compile cost to amortise).
"""

from __future__ import annotations

import numpy as np


def next_bucket(n: int, min_bucket: int = 8, quarter_from: int = 64) -> int:
    """Smallest bucket ≥ n from {min_bucket·2^k} ∪ quarter-octave steps.

    Below ``quarter_from`` buckets are powers of two of ``min_bucket``
    (few shapes, negligible absolute overcompute); above it, quarter-octave
    steps {1, 1.25, 1.5, 1.75}·2^k cap the padding overhead at 25%
    (mean ~12%) at ~4 compiles per octave.
    """
    if n <= min_bucket:
        return min_bucket
    p = 1 << (n - 1).bit_length()  # next power of two ≥ n
    if p <= quarter_from:
        return p
    half = p // 2  # always < n (p is the smallest power of two ≥ n)
    for q in (1, 2, 3):
        c = half + (half * q) // 4
        if c >= n:
            return c
    return p


def pad_axis0(x, size: int, fill=0):
    """Pad a numpy/JAX array along axis 0 to ``size`` with ``fill``."""
    x = np.asarray(x)
    if x.shape[0] >= size:
        return x
    pad = np.full((size - x.shape[0],) + x.shape[1:], fill, x.dtype)
    return np.concatenate([x, pad], axis=0)


def padded_batches(arrays, batch: int):
    """Iterate axis-0 of ``arrays`` in fixed ``batch``-size chunks, zero-
    padding the ragged tail so every dispatch hits ONE compile shape.

    Yields ``(chunk_list, start, n_valid)``; callers slice results back to
    ``n_valid``. Yields nothing when the arrays are empty — callers handle
    the empty case explicitly (their output shapes differ).
    """
    n = arrays[0].shape[0]
    for start in range(0, n, batch):
        chunk = [np.asarray(a[start : start + batch]) for a in arrays]
        n_valid = chunk[0].shape[0]
        if n_valid < batch:
            chunk = [
                np.concatenate(
                    [c, np.zeros((batch - n_valid,) + c.shape[1:], c.dtype)]
                )
                for c in chunk
            ]
        yield chunk, start, n_valid


def pad_poses(poses, size: int):
    """Pad a (F, 7) xyz+quat pose array along axis 0 to ``size`` frames
    with IDENTITY poses (zero translation, quaternion w = 1).

    All-zero pad rows are a latent NaN bomb: a zero quaternion normalizes
    to NaN rotation matrices, which then poison any masked reduction that
    multiplies before masking. Every frame-axis bucketing site must pad
    poses through this helper so the invariant is un-forgettable.

    Like :func:`pad_axis0`, returns the caller's array untouched when no
    padding is needed (never mutates caller memory — only the freshly
    concatenated pad rows are written).
    """
    poses = np.asarray(poses)
    if poses.shape[0] >= size:
        return poses
    pad = np.zeros((size - poses.shape[0],) + poses.shape[1:], poses.dtype)
    pad[:, 6] = 1.0
    return np.concatenate([poses, pad], axis=0)
