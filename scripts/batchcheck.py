"""On-device check: the merged-lane batch decode (fused Pallas tail on
TPU, parallel/batch.py) is bit-identical to the single-image decode path
for every image in the batch.

The CPU test suite cannot cover the fused batch tail (it is gated on the
TPU backend), so this is the hardware half of its correctness story, the
batch analog of scripts/run_matrix.py --device. Prints one JSON line.

Usage: python scripts/batchcheck.py [B] [image]
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jpeggpu_tpu_jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEFAULT_IMAGE = "/root/reference/images/IMG_6510.JPG"


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else 4
    image = args[1] if len(args) > 1 else DEFAULT_IMAGE

    import jax

    from jpeggpu_tpu import decode
    from jpeggpu_tpu.parallel.batch import BatchDecoder

    data = open(image, "rb").read()
    single = [np.asarray(p) for p in decode(data)]
    out = BatchDecoder().decode([data] * B)
    ok = all(
        len(planes) == len(single)
        and all(np.array_equal(a, b) for a, b in zip(planes, single))
        for planes in out)
    print(json.dumps({
        "backend": jax.default_backend(),
        "image": image,
        "batch": B,
        "planes": len(single),
        "batch_equals_single": bool(ok),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
