#!/usr/bin/env python
"""End-to-end decode CLI: JPEG in, PNG out.

The analog of the reference example tool (example/example_tool.c:75-181):
read the file, run the five-phase decode protocol, convert the planar
output to interleaved RGB on the host (util/util.h:33-107) and write a PNG.

Usage:
  python examples/decode_tool.py input.jpg [output.png] [--logging] [--info]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("output", nargs="?", default=None)
    ap.add_argument("--logging", action="store_true",
                    help="enable parser/stage logging")
    ap.add_argument("--info", action="store_true",
                    help="print header info and exit (no device work)")
    ap.add_argument("--planes", action="store_true",
                    help="write raw planes as .npy instead of RGB PNG")
    args = ap.parse_args(argv)

    data = open(args.input, "rb").read()

    from jpeggpu_tpu import Decoder

    with Decoder() as dec:
        dec.set_logging(args.logging)
        t0 = time.time()
        info = dec.parse_header(data)
        t_parse = time.time() - t0
        print(f"{args.input}: {info.sizes_x[0]}x{info.sizes_y[0]}, "
              f"{info.num_components} component(s), "
              f"subsampling {info.subsampling} "
              f"(parsed in {t_parse * 1e3:.2f} ms)")
        if args.info:
            return 0

        print(f"device buffer: {dec.get_buffer_size() / 1e6:.1f} MB")
        dec.transfer()
        t0 = time.time()
        planes = dec.decode()
        t_dec = time.time() - t0
        mp = info.sizes_x[0] * info.sizes_y[0] / 1e6
        print(f"decoded in {t_dec * 1e3:.1f} ms ({mp / t_dec:.1f} MP/s, "
              f"cold including compile)")

        out = args.output or (args.input.rsplit(".", 1)[0] + ".png")
        if args.planes or info.num_components not in (1, 3):
            for i, p in enumerate(planes):
                np.save(f"{out}.plane{i}.npy", p)
                print(f"wrote {out}.plane{i}.npy {p.shape}")
            return 0

        from jpeggpu_tpu.utils.color import to_rgb

        rgb = to_rgb(planes, info.subsampling)
        from PIL import Image

        Image.fromarray(rgb).save(out)
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
