"""MFuyu family (reference: mantis/models/mfuyu/)."""

from mantis_tpu.models.mfuyu.model import (
    MFuyuConfig,
    forward,
    image_token_ids,
    init_params,
    patchify,
)
from mantis_tpu.models.persimmon import PersimmonConfig
