#!/usr/bin/env python
"""Differential test-matrix runner: the analog of the reference's test.sh
(test/test.sh:31-43), which generates subsampling variants of one image and
diff-tests each against nvJPEG.

Here every variant is synthesized with the bundled encoder, decoded three
ways — golden CPU, device pipeline, libjpeg (PIL) — and reported as:
  exact   device vs golden bit-equality (must be True)
  MSE     luma MSE vs libjpeg (IDCT-rounding tolerance, ~0.2-1.0 expected,
          like the reference's nvJPEG comparison, test/test.cpp:299-314)

Usage: python scripts/run_matrix.py [image.jpg|image.png] [--json OUT]

With ``--json OUT`` the per-variant results (plus backend and device) are
recorded as a JSON artifact — run on the real TPU this is the on-device
bit-exactness record (the analog of the reference's device-side test binary,
test/test.cpp:162-214).
"""

import io
import json
import os
import sys
import time
# persistent compile cache: first tunnel compiles run 1-7 min (outliers 30+);
# repeat runs (e.g. the driver) become cache hits
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jpeggpu_tpu_jaxcache")


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
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if argv:
        img = np.array(Image.open(argv[0]).convert("RGB"))
        if img.shape[0] > 512:
            img = np.array(Image.fromarray(img).resize((512, 384)))
    else:
        rng = np.random.default_rng(0)
        base = rng.integers(0, 255, (8, 12, 3)).astype(np.uint8)
        img = np.array(Image.fromarray(base).resize((201, 131),
                                                    Image.BILINEAR))

    import jax

    print(f"{'variant':20s} {'exact':6s} {'luma MSE vs libjpeg':>20s}")
    failures = 0
    records = []
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
        print(f"{name:20s} {str(exact):6s} {mse:20.4f}", flush=True)
        records.append(dict(variant=name, exact=bool(exact),
                            luma_mse_vs_libjpeg=round(mse, 4)))
        if not exact or mse > 3.0:
            failures += 1
    print("FAILED" if failures else "OK")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(dict(
                backend=jax.default_backend(),
                device=str(jax.devices()[0]),
                when=time.strftime("%Y-%m-%dT%H:%M:%S"),
                ok=not failures,
                variants=records,
            ), f, indent=1)
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
