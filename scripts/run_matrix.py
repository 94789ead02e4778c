#!/usr/bin/env python
"""Differential test-matrix runner: the analog of the reference's test.sh
(test/test.sh:31-43), which generates subsampling variants of one image and
diff-tests each against nvJPEG.

Here every variant is synthesized with the bundled encoder, decoded three
ways — golden CPU, device pipeline, libjpeg (PIL) — and reported as:
  exact   device vs golden bit-equality (must be True)
  MSE     luma MSE vs libjpeg (IDCT-rounding tolerance, ~0.2-1.0 expected,
          like the reference's nvJPEG comparison, test/test.cpp:299-314)

Usage: python scripts/run_matrix.py [image.jpg|image.png]
"""

import io
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PIL import Image

from jpeggpu_tpu import golden
from jpeggpu_tpu.encoder import EncodeSpec, encode
from jpeggpu_tpu.pipeline import decode_jpeg_device

VARIANTS = [
    ("4:4:4", dict(sampling=[(1, 1), (1, 1), (1, 1)])),
    ("4:2:2", dict(sampling=[(2, 1), (1, 1), (1, 1)])),
    ("4:2:0", dict(sampling=[(2, 2), (1, 1), (1, 1)])),
    ("4:4:0", dict(sampling=[(1, 2), (1, 1), (1, 1)])),
    ("4:1:1", dict(sampling=[(4, 1), (1, 1), (1, 1)])),
    ("4:2:0 rst4", dict(sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=4)),
    ("non-interleaved", dict(sampling=[(2, 2), (1, 1), (1, 1)],
                             interleaved=False)),
    ("gray", "gray"),
    ("gray rst8", ("gray", dict(restart_interval=8))),
    ("4 tables", dict(sampling=[(2, 2), (1, 1), (1, 1)],
                      table_ids=[(0, 0), (1, 1), (2, 2)])),
]


def main():
    if len(sys.argv) > 1:
        img = np.array(Image.open(sys.argv[1]).convert("RGB"))
        if img.shape[0] > 512:
            img = np.array(Image.fromarray(img).resize((512, 384)))
    else:
        rng = np.random.default_rng(0)
        base = rng.integers(0, 255, (8, 12, 3)).astype(np.uint8)
        img = np.array(Image.fromarray(base).resize((201, 131),
                                                    Image.BILINEAR))

    print(f"{'variant':20s} {'exact':6s} {'luma MSE vs libjpeg':>20s}")
    failures = 0
    for name, spec in VARIANTS:
        if spec == "gray":
            data = encode(img[..., 0])
        elif isinstance(spec, tuple):
            data = encode(img[..., 0], EncodeSpec(**spec[1]))
        else:
            data = encode(img, EncodeSpec(**spec))
        ref = golden.decode(data)
        dev = decode_jpeg_device(data)
        exact = all(np.array_equal(a, b) for a, b in zip(ref, dev))
        pil = Image.open(io.BytesIO(data))
        y = (np.array(pil.convert("YCbCr"))[..., 0] if pil.mode != "L"
             else np.array(pil))
        mse = float(((dev[0].astype(int) - y.astype(int)) ** 2).mean())
        print(f"{name:20s} {str(exact):6s} {mse:20.4f}")
        if not exact or mse > 3.0:
            failures += 1
    print("FAILED" if failures else "OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
