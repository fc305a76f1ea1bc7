"""L3 mapping: fused 2D→3D bbox projection, 3D NMS, point-cloud ops."""

from tpu3dlm.mapper.projection import GlobalBoxes, project_detections  # noqa: F401
from tpu3dlm.mapper.nms3d import suppress_bboxes  # noqa: F401
