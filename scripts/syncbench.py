"""Micro-benchmark sync_states round-structure variants on the device.

sync_states is ~1/3 of the 12 MP device budget (BENCH.md). Its cost is
round-structured: blind pass + full round 1 + head-only "wide" rounds while
the mis-synced frontier exceeds the chain-follow tier's head capacity +
F-deep chain-follow rounds. This harness reports the round counts (diag)
and slope-timings for (frontier_width K, chain_follow F, head_width Kc)
variants to find whether wide rounds are worth skipping (head_width = K
enters the follow tier straight after round 1).

Usage: python scripts/syncbench.py [image] [--iters N]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEFAULT_IMAGE = "/root/reference/images/IMG_6510.JPG"


def timeit(fn, iters: int, warmup: int = 2) -> float:
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main() -> int:
    import jax
    import jax.numpy as jnp

    from jpeggpu_tpu.config import Tuning
    from jpeggpu_tpu.ops import huffman as H
    from jpeggpu_tpu.pipeline import build_inputs, build_plan
    from jpeggpu_tpu.reader import parse

    iters = 10
    argv = sys.argv[1:]
    if "--iters" in argv:
        i = argv.index("--iters")
        iters = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    image = args[0] if args else DEFAULT_IMAGE

    data = open(image, "rb").read()
    stream = parse(data)
    plan = build_plan(stream)
    inputs = build_inputs(data, plan)
    cfg0 = plan.signature.scans[0].cfg
    inp = jax.device_put(inputs["scans"][0])
    out = {"image": image, "lanes": cfg0.lanes, "iters": iters,
           "backend": jax.default_backend()}

    def mk_arrs(i, words=None):
        return H.ScanArrays(
            words=i["words"] if words is None else words,
            seg_of_subseq=i["seg_of_subseq"],
            seg_first_lane=i["seg_first_lane"],
            seg_num_subseq=i["seg_num_subseq"], maxcode=i["maxcode"],
            vsm=i["vsm"], huffval=i["huffval"])

    def compile_probe(fn):
        return jax.jit(fn).lower(inp).compile()

    def run(exe):
        return lambda: np.asarray(jax.tree.leaves(exe(inp))[0])[..., :1]

    def slope(name, stage_fn, K=3):
        def rep_f(KK):
            def f(i):
                words = i["words"]
                acc = jnp.zeros((), words.dtype)
                tot = jnp.int32(0)
                for _ in range(KK):
                    w2 = jnp.where(
                        acc == jnp.asarray(0xDEADBEEF, words.dtype),
                        words + 1, words)
                    o = stage_fn(i, w2)
                    s = o.reshape(-1)[0].astype(jnp.int32)
                    acc = s.astype(words.dtype)
                    tot = tot + s
                return tot.reshape(1)
            return f

        t0 = time.time()
        ts = {}
        for KK in (1, K):
            exe = compile_probe(rep_f(KK))
            ts[KK] = timeit(run(exe), iters) * 1e3
        out[name] = (ts[K] - ts[1]) / (K - 1)
        print(f"{name}: {out[name]:.2f} ms  (t1 {ts[1]:.1f}, t{K} {ts[K]:.1f},"
              f" compile+warm {time.time() - t0:.0f}s)", file=sys.stderr,
              flush=True)

    variants = [
        ("base", Tuning()),
        ("kc2048", Tuning(head_width=2048)),
        ("kc1024", Tuning(head_width=1024)),
        ("kc2048_f8", Tuning(head_width=2048, chain_follow=8)),
        ("kc1024_f8", Tuning(head_width=1024, chain_follow=8)),
        ("k4096_kc4096", Tuning(frontier_width=4096, head_width=4096)),
    ]

    # diag: wide-round and total-round counts per variant (one dispatch)
    for name, tuning in variants:
        cfg = dataclasses.replace(cfg0, tuning=tuning)

        def f_diag(i, cfg=cfg):
            arrs = mk_arrs(i)
            ctx = H.make_ctx(cfg, arrs)
            p, c, z, n, it0, it = H.sync_states(cfg, arrs, ctx, diag=True)
            return jnp.stack([it0, it])

        exe = compile_probe(f_diag)
        it0, it = np.asarray(exe(inp))
        out[f"{name}_rounds"] = [int(it0), int(it)]
        print(f"{name}: wide_rounds={it0} total={it}", file=sys.stderr,
              flush=True)

    for name, tuning in variants:
        cfg = dataclasses.replace(cfg0, tuning=tuning)

        def s_sync(i, w, cfg=cfg):
            arrs = mk_arrs(i, w)
            ctx = H.make_ctx(cfg, arrs)
            p, c, z, n = H.sync_states(cfg, arrs, ctx)
            return p + n

        slope(f"{name}_ms", s_sync)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
