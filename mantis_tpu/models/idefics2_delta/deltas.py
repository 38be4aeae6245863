"""Host-side delta-image computation (see package docstring).

Flow backend note: the reference imports NeuFlow for this
(``from ..NeuFlow import load_neuflow, get_flow_image``,
reference: modeling_idefics2.py:1211) — but ``mantis/models/NeuFlow``
does NOT exist anywhere in the reference repo, so that import is a
dead path (same class of quirk as SURVEY.md §2.8's
``mllava_type="mllava_next"`` ImportError).  cv2 Farneback here is a
*runnable* functional replacement producing the same HSV-coded flow
visualizations the delta model consumes; swap ``delta_frames`` for a
learned estimator if NeuFlow weights ever materialize.
"""

from __future__ import annotations

from typing import List

import numpy as np
from PIL import Image


def flow_to_image(flow: np.ndarray) -> Image.Image:
    """Optical flow [H, W, 2] -> HSV-coded RGB visualization."""
    import cv2

    h, w = flow.shape[:2]
    mag, ang = cv2.cartToPolar(flow[..., 0], flow[..., 1])
    hsv = np.zeros((h, w, 3), np.uint8)
    hsv[..., 0] = (ang * 180 / np.pi / 2).astype(np.uint8)
    hsv[..., 1] = 255
    hsv[..., 2] = cv2.normalize(mag, None, 0, 255,
                                cv2.NORM_MINMAX).astype(np.uint8)
    return Image.fromarray(cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB))


def delta_frames(frames: List[Image.Image]) -> List[Image.Image]:
    """Flow images between consecutive frames (len = len(frames) - 1)."""
    import cv2

    grays = [cv2.cvtColor(np.asarray(f.convert("RGB")),
                          cv2.COLOR_RGB2GRAY) for f in frames]
    out = []
    for a, b in zip(grays[:-1], grays[1:]):
        flow = cv2.calcOpticalFlowFarneback(
            a, b, None, 0.5, 3, 15, 3, 5, 1.2, 0)
        out.append(flow_to_image(flow))
    return out


def interleave_frames_and_deltas(frames: List[Image.Image]
                                 ) -> List[Image.Image]:
    """[f0, d01, f1, d12, f2, ...] — the media stream the delta model
    consumes (each <image> in text covers one entry)."""
    deltas = delta_frames(frames)
    out = [frames[0]]
    for d, f in zip(deltas, frames[1:]):
        out.extend([d, f])
    return out
