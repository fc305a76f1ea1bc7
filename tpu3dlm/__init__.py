"""tpu3dlm — TPU-native 3D localisation & mapping framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of
`ben-sanati/3d-localisation-and-mapping`: RGB-D → 3D object-mapping over
RTAB-Map scans (YOLOv10 detection, BEiT damage classification, fused 2D→3D
bbox unprojection, 3D NMS, ICP map alignment, bipartite missing-object
matching), designed TPU-first: pure-functional stage transforms over
fixed-shape padded arrays, `jit`/`vmap` compute, `shard_map` data
parallelism over the chip mesh, Pallas kernels for the hot ops, host-side
ingestion/visualisation at the edges.

Import name is `tpu3dlm` (the importable form of the project name
`3d-localisation-and-mapping_tpu`).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("TPU3DLM_PLATFORM"):
    # Escape hatch for environments that pre-import jax with a pinned
    # platform (sitecustomize): plain JAX_PLATFORMS is bound too early
    # there, but config updates still apply until a backend initialises.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["TPU3DLM_PLATFORM"])
