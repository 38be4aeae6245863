"""Pallas TPU kernels and compute ops for mantis_tpu."""

from mantis_tpu.ops.flash_attention import flash_attention, mha_reference

__all__ = ["flash_attention", "mha_reference"]
