"""MLlavaNext — LLaVA-NeXT anyres variant
(reference: mantis/models/mllava_next/__init__.py)."""

from mantis_tpu.models.mllava_next.model import (
    LlavaNextConfig,
    anyres_assembly_indices,
    forward,
    get_anyres_image_grid_shape,
    init_params,
    select_best_resolution,
    unpad_shape,
)
from mantis_tpu.models.mllava_next.processor import MLlavaNextProcessor
