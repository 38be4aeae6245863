"""InternVL-2.5 family — long-context path
(reference: mantis/models/intern_vl_25_8b/)."""

from mantis_tpu.models.intern_vl.model import (
    InternViTConfig,
    InternVLConfig,
    decoder_forward,
    encode_images,
    forward,
    init_cross_attention_params,
    init_params,
    pixel_shuffle,
)
from mantis_tpu.models.intern_vl.processor import (
    InternVLChatProcessor,
    dynamic_preprocess,
)
