"""Pure-JAX compute ops: geometry, image warps, NMS, matching, ICP, Pallas kernels."""

from tpu3dlm.ops import geometry  # noqa: F401
