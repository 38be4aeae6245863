"""Qwen2-VL family (reference: mantis/models/qwen2_vl/)."""

from mantis_tpu.models.qwen2_vl.model import (
    Qwen2VLConfig,
    Qwen2VLVisionConfig,
    forward,
    forward_classification,
    get_rope_index,
    init_classification_params,
    init_params,
    vision_rot_pos_ids,
    vision_segment_ids,
)
from mantis_tpu.models.qwen2_vl.processor import patchify_image, smart_resize
