"""Native C++ image preprocessing (native/imgproc.cpp): exact parity
with the numpy spec, Fuyu patchify layout parity, and pipeline wiring."""

import numpy as np
import pytest

from mantis_tpu.utils import native_imgproc as NI

pytestmark = pytest.mark.skipif(
    not NI.available(), reason="native library unavailable (no g++)")


def test_resize_normalize_matches_numpy_spec():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, size=(5, 37, 53, 3), dtype=np.uint8)
    mean, std = (0.5, 0.4, 0.3), (0.5, 0.6, 0.7)
    out = NI.batch_resize_normalize(imgs, 28, 28, mean, std)
    ref = NI.reference_resize_normalize(imgs, 28, 28, mean, std)
    assert out.shape == (5, 3, 28, 28)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_patchify_matches_model_layout():
    from mantis_tpu.models.mfuyu.model import patchify
    from PIL import Image

    rng = np.random.RandomState(1)
    arr = rng.randint(0, 256, size=(60, 90, 3), dtype=np.uint8)
    ref, rows, cols = patchify(Image.fromarray(arr), patch_size=30)
    canvas = (np.asarray(arr, np.float32) / 255.0 - 0.5) / 0.5
    out = NI.patchify_hwc(canvas, 30)
    assert out.shape == ref.shape == (rows * cols, 2700)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_processor_native_path():
    from PIL import Image

    from mantis_tpu.models.mllava.processor import (
        ImageProcessorConfig, MantisImageProcessor)

    # smooth gradients: the native path skips PIL's antialias filter,
    # which only matters for high-frequency content
    yy, xx = np.mgrid[0:40, 0:48]
    images = [Image.fromarray(np.stack(
        [(yy * 5 + i * 20) % 256, (xx * 5) % 256,
         ((yy + xx) * 3) % 256], -1).astype(np.uint8))
        for i in range(3)]
    cfg = ImageProcessorConfig.for_tower("siglip", 28)
    native = MantisImageProcessor(cfg, use_native=True)(images)
    pil = MantisImageProcessor(cfg, use_native=False)(images)
    assert native.shape == pil.shape == (3, 3, 28, 28)
    # bilinear-vs-bicubic: close but not identical
    assert float(np.abs(native - pil).mean()) < 0.1
