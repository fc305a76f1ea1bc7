"""L2 perception models: Flax YOLOv10 detector and BEiT classifier.

TPU-native replacements for the reference's torch/CUDA inference
(src/detector/detector.py wraps ultralytics YOLOv10; src/damage/classifier.py
wraps HF BeitForImageClassification). Both run as batched XLA graphs under
`jit`; YOLOv10 uses the NMS-free one-to-one head (static shapes, no dynamic
NMS on device), and BEiT classification is batched — fixing the reference's
acknowledged per-crop loop (classifier.py:18).
"""

from tpu3dlm.models.yolov10 import YOLOv10, yolov10_variant  # noqa: F401
from tpu3dlm.models.beit import BeitClassifier, BeitConfig  # noqa: F401
