"""SigLIP-Video contrastive family
(reference: mantis/models/siglip_video/)."""

from mantis_tpu.models.siglip_video.model import (
    SiglipTextConfig,
    SiglipVideoConfig,
    encode_video,
    forward,
    init_params,
    sigmoid_contrastive_loss,
    text_forward,
)
