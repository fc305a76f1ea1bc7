"""Multi-chip execution: mesh construction, data-parallel inference, finetuning.

The reference is single-process, single-GPU (SURVEY.md §2c: no distributed
anything); scaling is a first-class capability of this framework instead:
the frame axis of a Scan shards over a 1-D ``batch`` mesh via NamedSharding
(XLA inserts the collectives), and finetuning uses `shard_map` with explicit
``psum`` gradient reduction over ICI. Tensor/pipeline/sequence parallelism
is deliberately absent — YOLOv10-N/BEiT-base fit on one chip (SURVEY.md §2c
documents this as a non-goal).
"""

from tpu3dlm.parallel.mesh import make_mesh, shard_batch  # noqa: F401
