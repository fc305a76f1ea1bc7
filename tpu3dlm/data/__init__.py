"""L1 host-side ingestion: RTAB-Map SQLite, poses, calibration, PLY, datasets.

Ingestion stays on the host CPU feeding the TPU (SURVEY.md §2c): these
modules parse a scan's on-disk artefacts into the fixed-shape ``Scan``
pytree that every device-side stage consumes.
"""

from tpu3dlm.data.scan import Detections, Scan  # noqa: F401
