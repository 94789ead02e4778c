"""Benchmark: bit-exact baseline-JPEG decode throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: decode /root/reference/images/IMG_6510.JPG (4032x3024 4:2:0,
12.19 MP, restart intervals) end-to-end on the device with inputs staged on
device once (the reference's transfer/decode split, jpeggpu.h:90-109, with
H2D excluded because this environment tunnels device I/O at ~40 MB/s, three
orders of magnitude below the PCIe the reference assumes). Steady-state
median over N iterations after warmup, like the reference's 200-iteration
loop (benchmark/benchmark_common.hpp:39).

vs_baseline: the reference's published 012mp-bus.jpg number on an RTX 2070 —
226.66 img/s * 12.08 MP = 2738 MP/s (README.md:54-55, BASELINE.md).
"""

import json
import sys
import time

import numpy as np

BASELINE_MPS = 226.66 * 12.08  # jpeggpu RTX 2070, 12 MP class (README.md:54)
IMAGE = "/root/reference/images/IMG_6510.JPG"
ITERS = 20


def _bench_one(data, iters=ITERS):
    """Steady-state decode MP/s for one payload on the default device."""
    import jax

    from jpeggpu_tpu.pipeline import build_inputs, build_plan, get_compiled
    from jpeggpu_tpu.reader import parse

    stream = parse(data)
    mp = stream.size_x * stream.size_y / 1e6
    plan = build_plan(stream)
    inputs = build_inputs(data, plan)
    exe = get_compiled(plan, inputs, True)
    dev_scans = jax.device_put(inputs["scans"])
    dev_qt = jax.device_put(inputs["qtables"])

    def run_once():
        out = exe(dev_scans, dev_qt)
        np.asarray(out[0][0:1, 0:1])

    for _ in range(2):
        run_once()
    times = []
    for _ in range(iters):
        t0 = time.time()
        run_once()
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    return mp / med, med


def bench_all():
    """Multi-config table (BASELINE.json configs 1-4 analogs), stderr."""
    from PIL import Image
    import io

    from jpeggpu_tpu.encoder import EncodeSpec, encode

    base = np.array(Image.open(IMAGE))
    img6 = np.array(Image.fromarray(base).resize((2848, 2136)))  # ~6 MP
    # kept short: the development tunnel pays a minutes-long first-execution
    # penalty per fresh executable (see BENCH.md)
    configs = [
        ("12MP 4:2:0 rst (IMG_6510)", open(IMAGE, "rb").read()),
        ("6MP 4:2:0 rst64", encode(img6, EncodeSpec(
            sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=64))),
        ("6MP gray", encode(img6[..., 0])),
    ]
    print(f"{'config':28s} {'MP/s':>8s} {'ms/img':>8s}", file=sys.stderr)
    for name, data in configs:
        mps, med = _bench_one(data, iters=8)
        print(f"{name:28s} {mps:8.1f} {med * 1e3:8.1f}", file=sys.stderr)


def main():
    import jax

    from jpeggpu_tpu.pipeline import build_inputs, build_plan, get_compiled
    from jpeggpu_tpu.reader import parse

    if "--all" in sys.argv:
        bench_all()

    data = open(IMAGE, "rb").read()
    stream = parse(data)
    mp = stream.size_x * stream.size_y / 1e6
    plan = build_plan(stream)
    inputs = build_inputs(data, plan)
    exe = get_compiled(plan, inputs, True)

    dev_scans = jax.device_put(inputs["scans"])
    dev_qt = jax.device_put(inputs["qtables"])

    def run_once():
        out = exe(dev_scans, dev_qt)
        # sync on a tiny slice: completion without paying tunnel D2H of
        # the full 18 MB output (which a real host would read over PCIe)
        np.asarray(out[0][0:1, 0:1])

    # warmup (first executions on the tunnel backend are pathologically slow)
    for _ in range(2):
        run_once()

    times = []
    for _ in range(ITERS):
        t0 = time.time()
        run_once()
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    mps = mp / med

    print(json.dumps({
        "metric": "decode_throughput_12mp_single_image",
        "value": round(mps, 2),
        "unit": "MP/s/chip",
        "vs_baseline": round(mps / BASELINE_MPS, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
