"""Capture a jax.profiler device trace of one merged-lane batch decode.

Usage: python scripts/batchprof.py <logdir> [B]
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jpeggpu_tpu_jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMAGE = "/root/reference/images/IMG_6510.JPG"


def main():
    logdir = sys.argv[1]
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    import jax

    from jpeggpu_tpu.parallel.batch import (_merged_pipeline, _tables_shared,
                                            merge_scan_inputs)
    from jpeggpu_tpu.pipeline import build_inputs, build_plan
    from jpeggpu_tpu.reader import parse

    data = open(IMAGE, "rb").read()
    stream = parse(data)
    plan = build_plan(stream)
    per_image = [build_inputs(data, plan) for _ in range(B)]
    sig = plan.signature
    assert all(_tables_shared([bi["scans"][s] for bi in per_image])
               for s in range(len(sig.scans)))
    merged = [merge_scan_inputs(sp, [bi["scans"][s] for bi in per_image])
              for s, sp in enumerate(sig.scans)]
    qtables = np.stack([bi["qtables"] for bi in per_image])
    exe = _merged_pipeline.lower(sig, merged, qtables, True).compile()
    dev_m = jax.device_put(merged)
    dev_q = jax.device_put(qtables)

    def run_once():
        out = exe(dev_m, dev_q)
        np.asarray(out[0][0:1, 0:1, 0:1])

    import time
    for i in range(2):
        t0 = time.perf_counter()
        run_once()
        print(f"warm {i}: {time.perf_counter() - t0:.2f}s", file=sys.stderr)
    from jpeggpu_tpu.debug import profile_trace
    with profile_trace(logdir):
        run_once()
    print("trace written to", logdir, file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
