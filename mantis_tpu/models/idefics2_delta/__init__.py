"""Idefics2-Delta — experimental video variant feeding optical-flow
"delta" images between consecutive frames alongside the frames
(reference: mantis/models/idefics2_delta/,
``Idefics2DeltaModel`` modeling_idefics2.py:1240 with a NeuFlow
checkpoint as ``DeltaFlowModel`` :1213-1235).

NeuFlow is an external torch checkpoint; this port computes deltas
host-side with cv2 Farneback optical flow (documented deviation) and
feeds frame+delta pairs through the standard Idefics2 stack — the model
graph is identical to mantis_tpu.models.idefics2 with doubled media.
"""

from mantis_tpu.models.idefics2_delta.deltas import (
    delta_frames,
    flow_to_image,
    interleave_frames_and_deltas,
)
