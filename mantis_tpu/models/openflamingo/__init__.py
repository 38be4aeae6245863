"""OpenFlamingo family (reference: mantis/models/openflamingo/)."""

from mantis_tpu.models.openflamingo.model import (
    FlamingoConfig,
    forward,
    init_params,
    perceiver_resample,
)
