"""Idefics3 family (reference: mantis/models/idefics3/)."""

from mantis_tpu.models.idefics3.model import (
    Idefics3Config,
    encode_images,
    forward,
    init_params,
    pixel_shuffle_idefics3,
)
