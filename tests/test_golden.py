"""Golden CPU decoder vs libjpeg (PIL): the external correctness anchor.

The reference uses nvJPEG as a near-equal oracle with per-component MSE
(test/test.cpp:299-314, expected ~0.2); we use libjpeg through PIL the same
way — exactness between golden and the device pipeline is asserted
elsewhere (test_device_bitexact.py)."""

import io

import numpy as np
import pytest
from PIL import Image

from jpeggpu_tpu import golden
from jpeggpu_tpu.encoder import EncodeSpec, encode

MSE_TOL = 3.0  # IDCT implementations differ; reference sees ~0.2 vs nvJPEG


def _pil_planes(data, ncomp):
    img = Image.open(io.BytesIO(data))
    if ncomp == 1:
        return [np.array(img.convert("L"))]
    if ncomp == 3:
        ycc = np.array(img.convert("YCbCr"))
        return [ycc[..., i] for i in range(3)]
    return [np.array(img)[..., i] for i in range(ncomp)]


def _check(data, ncomp=3):
    ours = golden.decode(data)
    ref = _pil_planes(data, ncomp)
    # luma plane must agree to IDCT tolerance (chroma is subsampled in PIL's
    # conversion so only compare when shapes match)
    for o, r in zip(ours, ref):
        if o.shape == r.shape:
            mse = ((o.astype(int) - r.astype(int)) ** 2).mean()
            assert mse < MSE_TOL, mse


SPECS = [
    ("444", dict(sampling=[(1, 1), (1, 1), (1, 1)])),
    ("422", dict(sampling=[(2, 1), (1, 1), (1, 1)])),
    ("420", dict(sampling=[(2, 2), (1, 1), (1, 1)])),
    ("440", dict(sampling=[(1, 2), (1, 1), (1, 1)])),
    ("411", dict(sampling=[(4, 1), (1, 1), (1, 1)])),
    ("420_rst2", dict(sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=2)),
    ("444_rst1", dict(sampling=[(1, 1), (1, 1), (1, 1)], restart_interval=1)),
    ("q10", dict(quality=10)),
    ("q98", dict(quality=98)),
]


@pytest.mark.parametrize("name,kw", SPECS, ids=[s[0] for s in SPECS])
def test_golden_vs_pil(test_image, name, kw):
    _check(encode(test_image, EncodeSpec(**kw)))


def test_golden_gray(test_image):
    _check(encode(test_image[..., 0]), ncomp=1)


def test_golden_noise(noise_image):
    _check(encode(noise_image, EncodeSpec(quality=95)))


def test_golden_non_interleaved(test_image):
    # PIL/libjpeg decodes multi-scan baseline streams too
    _check(encode(test_image, EncodeSpec(
        sampling=[(2, 2), (1, 1), (1, 1)], interleaved=False)))
