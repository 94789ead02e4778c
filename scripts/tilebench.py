"""Micro-benchmark of the coefficient-write assembly stage (one script,
probe-selectable — consolidates the former tilebench1..6 investigation).

Times isolated assembly formulations on synthetic records with
bench-image-like density (~200 records/lane, ~13 DU span). Probes:

    --probe lane     production per-lane path (assemble_tiles) at tile_d
                     96 and 64: one small batched one-hot dot per lane
                     per round
    --probe super    production supertile path (assemble_supertiles):
                     G lanes share one (128, 64) tile, one unbatched
                     byte-plane bf16 dot pair per round
    --probe decomp   cost decomposition of the per-lane kernel: full f32
                     round body vs one-hot builds consumed WITHOUT the
                     dot (is the bound the VPU build or the MXU dot?)

Conclusions of the retired probe generations (full chain in BENCH.md
"Tile-assembly investigation"): the per-lane batched dot runs ~1% of MXU
peak because Mosaic serializes the batch dim; narrow-dtype (int8/bf16)
batched forms either fail to lower or relayout; record-slice dynamism,
accumulator dtype, and tile depth are all immaterial. The supertile path
(ONE unbatched dot pair per round, records pre-interleaved in XLA) is the
fix: 3.71 ms vs 13.67 ms on the 12 MP bench records (v5e 2026-08-19).

Usage: python scripts/tilebench.py [--probe lane|super|decomp] [--iters N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, iters: int, warmup: int = 2) -> float:
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def synth_records(lanes=24576, s_cap=1280, sym_per_lane=200, du_span=13,
                  seed=0):
    """Records shaped like the 12 MP bench image: ~200 symbols/lane in
    stream order, spanning ~13 data units starting at a nondecreasing du0."""
    rng = np.random.default_rng(seed)
    m = np.clip(rng.normal(sym_per_lane, 30, lanes), 32, 512).astype(np.int32)
    du0 = np.cumsum(rng.integers(10, 16, lanes)).astype(np.int32)
    val = np.zeros((s_cap, lanes), np.int16)
    wpos = np.full((s_cap, lanes), -1, np.int32)
    slot = np.arange(s_cap)[:, None]
    live = slot < m[None, :]
    # positions advance ~ du_span*64/sym_per_lane per slot, within the lane
    step = np.maximum(rng.integers(1, 2 * du_span * 64 // sym_per_lane,
                                   (s_cap, lanes)), 1)
    pos = du0[None, :] * 64 + np.cumsum(step, axis=0)
    val[live] = rng.integers(-1024, 1024, (s_cap, lanes))[live]
    wpos[live] = pos[live]
    total = int((du0[-1] + du_span + 4)) * 64
    return val, wpos, m, du0, total


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from jpeggpu_tpu.ops import write_pallas as WP

    iters = 10
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    probe = "lane"
    if "--probe" in sys.argv:
        probe = sys.argv[sys.argv.index("--probe") + 1]

    val, wpos, m, du0, total = synth_records()
    lanes, s_cap = val.shape[1], val.shape[0]
    inc = np.ones(lanes, bool)
    inp = jax.device_put({
        "val": jnp.asarray(val), "wpos": jnp.asarray(wpos),
        "m": jnp.asarray(m), "du0": jnp.asarray(du0),
        "inc": jnp.asarray(inc)})
    out = {"lanes": lanes, "s_cap": s_cap, "iters": iters, "probe": probe,
           "backend": jax.default_backend()}

    def compile_probe(fn):
        return jax.jit(fn).lower(inp).compile()

    def run(exe):
        return lambda: np.asarray(jax.tree.leaves(exe(inp))[0])[..., :1]

    # slope harness: K reps inside one executable behind a vector dependence
    def slope(name, stage_fn, K=3):
        def rep_f(KK):
            def f(i):
                v = i["val"]
                acc = jnp.zeros((), jnp.int16)
                tot = jnp.int32(0)
                for _ in range(KK):
                    v2 = jnp.where(acc == jnp.int16(-32768), v + 1, v)
                    o = stage_fn(i, v2)
                    s = o.reshape(-1)[0].astype(jnp.int32)
                    acc = s.astype(jnp.int16)
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

    def pack(i, v):
        # synthetic records -> packed contract (pos0 anchored at each
        # lane's first data unit; spans fit the int16 local half)
        from jpeggpu_tpu.ops import huffman as H

        pos0 = i["du0"] * 64
        wl = jnp.where(i["wpos"] >= 0, i["wpos"] - pos0[None, :], -1)
        return H.pack_record(v.astype(jnp.int32), wl), pos0

    if probe == "lane":
        slope("stage1_d96_ms", lambda i, v: WP.tiles_from_records(
            v, i["wpos"], i["m"], i["du0"], i["inc"], 96))
        slope("stage1_d64_ms", lambda i, v: WP.tiles_from_records(
            v, i["wpos"], i["m"], i["du0"], i["inc"], 64))
        slope("assemble_lane_ms", lambda i, v: WP.assemble_tiles(
            *pack(i, v)[:1], i["m"], i["du0"], pack(i, v)[1], total, 96,
            "f32"))

    elif probe == "super":
        slope("assemble_super_ms", lambda i, v: WP.assemble_supertiles(
            pack(i, v)[0], i["m"], i["du0"], pack(i, v)[1], total, 8, 4))
        slope("assemble_lane_ms", lambda i, v: WP.assemble_tiles(
            pack(i, v)[0], i["m"], i["du0"], pack(i, v)[1], total, 96,
            "f32"))

    elif probe == "decomp":
        # per-lane round body with and without the dot: if build-only ~= full,
        # the VPU one-hot build is the bound, not the MXU contraction
        TD, R, WL = 96, 128, 64

        def make_variant(with_dot):
            def kern(valT_ref, wposT_ref, m_ref, du0_ref, tiles_out, acc_ref):
                mv = m_ref[:, 0]
                mmax = jnp.max(mv)
                du0v = du0_ref[:, 0]
                iota_d = jax.lax.broadcasted_iota(jnp.int32, (1, 1, TD), 2)
                iota_z = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 64), 2)
                iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, R, 1), 1)
                acc_ref[:] = jnp.zeros_like(acc_ref)

                def round_body(r):
                    v = valT_ref[:, pl.ds(r * R, R)].astype(jnp.int32)
                    w = wposT_ref[:, pl.ds(r * R, R)]
                    slot = r * R + iota_s
                    valid = (slot < mv[:, None, None]) & (w[:, :, None] >= 0)
                    d_rel = (w >> 6) - du0v[:, None]
                    iz = w & 63
                    valid = valid & (d_rel[:, :, None] >= 0) \
                        & (d_rel[:, :, None] < TD)
                    ad = (d_rel[:, :, None] == iota_d) & valid
                    bz = iz[:, :, None] == iota_z
                    a = jnp.where(ad, 1.0, 0.0)
                    b = jnp.where(bz, v[:, :, None].astype(jnp.float32), 0.0)
                    if with_dot:
                        acc_ref[:] += jax.lax.dot_general(
                            a, b, (((1,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
                    else:
                        acc_ref[:] += (jnp.sum(a, axis=1)[:, :, None]
                                       + jnp.sum(b, axis=1)[:, None, :])
                    return r + 1

                jax.lax.while_loop(lambda r: r * R < mmax, round_body,
                                   jnp.int32(0))
                tiles_out[:] = acc_ref[:].astype(jnp.int16)

            def call(valT, wposT, mv, du0v):
                col_spec = pl.BlockSpec((WL, 1), lambda b: (b, 0),
                                        memory_space=pltpu.VMEM)
                rec_spec = pl.BlockSpec((WL, s_cap), lambda b: (b, 0),
                                        memory_space=pltpu.VMEM)
                return pl.pallas_call(
                    kern,
                    grid=(lanes // WL,),
                    in_specs=[rec_spec, rec_spec, col_spec, col_spec],
                    out_specs=pl.BlockSpec((WL, TD, 64), lambda b: (b, 0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((lanes, TD, 64), jnp.int16),
                    scratch_shapes=[pltpu.VMEM((WL, TD, 64), jnp.float32)],
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 * 1024 * 1024),
                )(valT, wposT, mv.reshape(-1, 1), du0v.reshape(-1, 1))

            return call

        full = make_variant(True)
        build = make_variant(False)
        slope("full_f32_ms",
              lambda i, v: full(v.T, i["wpos"].T, i["m"], i["du0"]))
        slope("build_only_ms",
              lambda i, v: build(v.T, i["wpos"].T, i["m"], i["du0"]))

    else:
        print(f"unknown probe {probe!r}", file=sys.stderr)
        return 2

    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in out.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
