"""Idefics2 family — Mantis-8B-Idefics2 (reference:
mantis/models/idefics2/modeling_idefics2.py)."""

from mantis_tpu.models.idefics2.model import (
    Idefics2Config,
    PerceiverConfig,
    build_patch_grid,
    encode_images,
    forward,
    forward_classification,
    init_classification_params,
    init_params,
    navit_position_ids,
)
from mantis_tpu.models.idefics2.processor import Idefics2Processor
