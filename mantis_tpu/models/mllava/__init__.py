"""MLlava family — the Mantis flagship (CLIP/SigLIP ViT + MLP projector +
LLaMA-3), TPU-native (reference: mantis/models/mllava/__init__.py:1-4)."""

from mantis_tpu.models.mllava.chat import MantisLlava, chat_mllava
from mantis_tpu.models.mllava.model import (
    cross_entropy_loss,
    encode_images,
    forward,
    init_params,
    merge_image_features,
)
from mantis_tpu.models.mllava.processor import (
    MantisImageProcessor,
    MLlavaProcessor,
)

__all__ = [
    "MantisLlava", "chat_mllava", "forward", "init_params",
    "encode_images", "merge_image_features", "cross_entropy_loss",
    "MLlavaProcessor", "MantisImageProcessor",
]
