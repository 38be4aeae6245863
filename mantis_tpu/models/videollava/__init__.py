"""Video-LLaVA model family (reference: mantis/train/train_videollava.py
trains HF ``VideoLlavaForConditionalGeneration``)."""

from mantis_tpu.models.videollava.model import (VideoLlavaConfig,
                                                forward, init_params)
from mantis_tpu.models.videollava.processor import VideoLlavaProcessor

__all__ = ["VideoLlavaConfig", "forward", "init_params",
           "VideoLlavaProcessor"]
