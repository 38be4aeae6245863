"""Offline dataset preparation — the Mantis-Instruct schema tooling
(reference: data/ — ~30 per-dataset prepare.py scripts emitting
{id, images[], conversations[]} per data/README.md:7-40)."""

from mantis_tpu.data_prep.schema import (
    make_example,
    validate_example,
    write_dataset,
)
