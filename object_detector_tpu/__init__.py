"""tpu-object-detector: a TPU-native object-detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the SSD-style
Keras detector ``ak110/object_detector`` (reference unavailable at survey
time — see SURVEY.md §0; capability contract from BASELINE.json):

- VOC/COCO data pipelines with fused on-device preprocessing/augmentation
- vectorized prior-box generation, IoU matching, box encode/decode
- VGG16 / ResNet-50 backbones, SSD-300 / SSD-512 heads, FPN/RetinaNet variant
- focal + smooth-L1 losses
- Pallas decode+NMS postprocessor (batched inference fully on-chip)
- data-parallel training over a `jax.sharding.Mesh` (ICI within a slice,
  DCN across hosts)

Public entry points mirror the reference CLI: train / predict / evaluate.
"""

__version__ = "0.1.0"

from object_detector_tpu.core.config import (  # noqa: F401
    DetectorConfig,
    get_config,
    list_presets,
)
