"""Dump the per-lane emitted-record counts (m) of the bench image: the
slot-waste profile of stage1's round loop (rounds stream ceil(blockmax/128)
slot-rows per lane regardless of each lane's own m)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from jpeggpu_tpu.ops import huffman as H
    from jpeggpu_tpu.pipeline import build_inputs, build_plan
    from jpeggpu_tpu.reader import parse

    image = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/images/IMG_6510.JPG"
    data = open(image, "rb").read()
    stream = parse(data)
    plan = build_plan(stream)
    inputs = build_inputs(data, plan)
    cfg = plan.signature.scans[0].cfg
    inp = jax.device_put(inputs["scans"][0])

    def f(i):
        arrs = H.ScanArrays(
            words=i["words"], seg_of_subseq=i["seg_of_subseq"],
            seg_first_lane=i["seg_first_lane"],
            seg_num_subseq=i["seg_num_subseq"], maxcode=i["maxcode"],
            vsm=i["vsm"], huffval=i["huffval"])
        ctx = H.make_ctx(cfg, arrs)
        p, c, z, n = H.sync_states(cfg, arrs, ctx)
        n_off = H.symbol_offsets(cfg, arrs, n)
        rec, m = H.decode_write_emit(cfg, arrs, ctx, p, c, z, n_off)
        return m

    m = np.asarray(jax.jit(f).lower(inp).compile()(inp)).astype(np.int64)
    live = m[m > 0]
    print("lanes", len(m), "live", len(live), "mean m", round(live.mean(), 1),
          "p50", np.percentile(live, 50), "p95", np.percentile(live, 95),
          "max", live.max(), "s_cap", H._emit_cap(cfg.tuning.write_chunk))
    for WL in (8, 16, 32, 64):
        blocks = m.reshape(-1, WL)
        rounds = np.ceil(blocks.max(axis=1) / 128).clip(1)
        streamed = (rounds * 128 * WL).sum()
        print(f"WL={WL:3d}: streamed {streamed/1e6:.2f}M slot-rows vs useful "
              f"{m.sum()/1e6:.2f}M -> waste x{streamed/m.sum():.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
