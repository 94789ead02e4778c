"""Frontier trajectory of sync_states on a real image: how many mis-synced
lanes remain after the blind pass, round 1, and each subsequent Jacobi
round (run at full width here so every round's frontier is observable).

This tells us which tier the 5-wide + 4-chain-follow round structure is
spending its rounds on, and whether the tiers' widths (frontier_width /
head_width / chain_follow) match the image's actual chain-depth profile.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

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

    def make(i):
        arrs = H.ScanArrays(
            words=i["words"], seg_of_subseq=i["seg_of_subseq"],
            seg_first_lane=i["seg_first_lane"],
            seg_num_subseq=i["seg_num_subseq"], maxcode=i["maxcode"],
            vsm=i["vsm"], huffval=i["huffval"])
        return arrs, H.make_ctx(cfg, arrs)

    lanes = cfg.lanes
    R = 24  # full-width Jacobi rounds to trace

    def trace(i):
        arrs, ctx = make(i)
        blind_p = ctx.rel * H.C.SUBSEQ_SIZE_BITS
        zeros = jnp.zeros(lanes, jnp.int32)
        p, c, z, n = H._decode_subseq_pass(cfg, arrs, ctx, blind_p, zeros,
                                           zeros, ctx.lane_valid)
        counts = []
        # full-width rounds; frontier = lanes whose predecessor changed
        delta = jnp.ones(lanes, jnp.bool_)
        for r in range(R):
            sp = jnp.where(ctx.first_of_seg, blind_p, jnp.roll(p, 1))
            sc = jnp.where(ctx.first_of_seg, 0, jnp.roll(c, 1))
            sz = jnp.where(ctx.first_of_seg, 0, jnp.roll(z, 1))
            frontier = jnp.roll(delta, 1) & ~ctx.first_of_seg \
                & ctx.lane_valid
            act = frontier if r > 0 else ctx.lane_valid
            p2, c2, z2, n2 = H._decode_subseq_pass(cfg, arrs, ctx, sp, sc,
                                                   sz, act)
            p2 = jnp.where(act & ctx.lane_valid, p2, p)
            c2 = jnp.where(act & ctx.lane_valid, c2, c)
            z2 = jnp.where(act & ctx.lane_valid, z2, z)
            delta = (p2 != p) | (c2 != c) | (z2 != z)
            counts.append(jnp.sum(delta.astype(jnp.int32)))
            p, c, z = p2, c2, z2
        return jnp.stack(counts)

    t0 = time.time()
    exe = jax.jit(trace).lower(inp).compile()
    print(f"compiled in {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    t0 = time.time()
    counts = np.asarray(exe(inp))
    print(f"executed in {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    print("lanes", lanes, "num_subseq", cfg.num_subseq)
    print("changed lanes after round r (round 1 = first predecessor-fed "
          "round):")
    for r, cnt in enumerate(counts):
        print(f"  round {r+1:2d}: {int(cnt)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
