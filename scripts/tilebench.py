"""Micro-benchmark variants of the tile-assembly stage1 kernel.

Stage1 (write_pallas.tiles_from_records) turns dense (slot, lane) records
into per-lane (tile_d, 64) data-unit tiles with batched one-hot MXU
contractions; it dominates the coefficient write (~2/3 of the stage, see
BENCH.md). This harness times isolated variants on synthetic records with
bench-image-like density to find the binding resource:

    base          the production kernel (f32 one-hots, f32 dot)
    build_only    one-hot builds + jnp.sum reduction, no dot (is the MXU
                  the bound, or the VPU build?)
    int8          int8 one-hots, value split into lo/hi bytes, int32 dots
    bf16          bf16 one-hots, value split hi/lo, f32 accumulation
    tile_d=K      the production kernel at smaller/larger tile depth
    notranspose   production kernel fed pre-transposed (lane-major) arrays
                  (how much do the val.T/wpos.T XLA relayouts cost?)

Usage: python scripts/tilebench.py [--iters N]
"""

from __future__ import annotations

import functools
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
    return val, wpos, m, du0


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from jpeggpu_tpu.ops import write_pallas as WP

    iters = 10
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])

    val, wpos, m, du0 = synth_records()
    lanes, s_cap = val.shape[1], val.shape[0]
    inc = np.ones(lanes, bool)
    inp = jax.device_put({
        "val": jnp.asarray(val), "wpos": jnp.asarray(wpos),
        "valT": jnp.asarray(val.T), "wposT": jnp.asarray(wpos.T),
        "m": jnp.asarray(m), "du0": jnp.asarray(du0),
        "inc": jnp.asarray(inc)})
    out = {"lanes": lanes, "s_cap": s_cap, "iters": iters,
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

    TD = 96
    R = 128
    WL = 64

    def s_base(i, v):
        return WP.tiles_from_records(v, i["wpos"], i["m"], i["du0"],
                                     i["inc"], TD)

    def s_base64(i, v):
        return WP.tiles_from_records(v, i["wpos"], i["m"], i["du0"],
                                     i["inc"], 64)

    # ---- variant kernels ----------------------------------------------
    def make_variant(mode, tile_d=TD):
        def kern(valT_ref, wposT_ref, m_ref, du0_ref, tiles_out, acc_ref):
            mv = m_ref[:, 0]
            mmax = jnp.max(mv)
            du0v = du0_ref[:, 0]
            iota_d = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tile_d), 2)
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
                    & (d_rel[:, :, None] < tile_d)
                ad = (d_rel[:, :, None] == iota_d) & valid
                bz = iz[:, :, None] == iota_z
                if mode == "build_only":
                    a = jnp.where(ad, 1.0, 0.0)
                    b = jnp.where(bz, v[:, :, None].astype(jnp.float32), 0.0)
                    acc_ref[:] += (jnp.sum(a, axis=1)[:, :, None]
                                   + jnp.sum(b, axis=1)[:, None, :])
                elif mode == "int8":
                    a = jnp.where(ad, jnp.int8(1), jnp.int8(0))
                    lo = jnp.where(bz, (v & 0xFF)[:, :, None].astype(jnp.int8),
                                   jnp.int8(0))
                    hi = jnp.where(bz, (v >> 8)[:, :, None].astype(jnp.int8),
                                   jnp.int8(0))
                    dn = (((1,), (1,)), ((0,), (0,)))
                    tl = jax.lax.dot_general(
                        a, lo, dn, preferred_element_type=jnp.int32)
                    th = jax.lax.dot_general(
                        a, hi, dn, preferred_element_type=jnp.int32)
                    # each cell receives at most one term, so tl is the one
                    # signed-wrapped lo byte: unwrap with & 0xFF
                    acc_ref[:] += (th << 8) + (tl & 0xFF)
                elif mode == "bf16":
                    a = jnp.where(ad, 1.0, 0.0).astype(jnp.bfloat16)
                    vf = v[:, :, None]
                    lo = jnp.where(bz, (vf & 0xFF).astype(jnp.bfloat16), 0)
                    hi = jnp.where(bz, (vf >> 8).astype(jnp.bfloat16), 0)
                    dn = (((1,), (1,)), ((0,), (0,)))
                    tl = jax.lax.dot_general(
                        a, lo, dn, preferred_element_type=jnp.float32)
                    th = jax.lax.dot_general(
                        a, hi, dn, preferred_element_type=jnp.float32)
                    acc_ref[:] += tl + th * 256.0
                else:  # f32 (the production formulation)
                    a = jnp.where(ad, 1.0, 0.0)
                    b = jnp.where(bz, v[:, :, None].astype(jnp.float32), 0.0)
                    acc_ref[:] += jax.lax.dot_general(
                        a, b, (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                return r + 1

            jax.lax.while_loop(lambda r: r * R < mmax, round_body,
                               jnp.int32(0))
            tiles_out[:] = acc_ref[:].astype(jnp.int16)

        acc_dt = jnp.int32 if mode == "int8" else jnp.float32
        acc_shape = ((WL, tile_d, 64) if mode != "build_only"
                     else (WL, tile_d, 64))

        def call(valT, wposT, mv, du0v):
            grid = (lanes // WL,)
            col_spec = pl.BlockSpec((WL, 1), lambda b: (b, 0),
                                    memory_space=pltpu.VMEM)
            rec_spec = pl.BlockSpec((WL, s_cap), lambda b: (b, 0),
                                    memory_space=pltpu.VMEM)
            return pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[rec_spec, rec_spec, col_spec, col_spec],
                out_specs=pl.BlockSpec((WL, tile_d, 64), lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((lanes, tile_d, 64),
                                               jnp.int16),
                scratch_shapes=[pltpu.VMEM(acc_shape, acc_dt)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(valT, wposT, mv.reshape(-1, 1), du0v.reshape(-1, 1))

        return call

    def s_variant(mode, tile_d=TD, pre_t=False):
        call = make_variant(mode, tile_d)

        def f(i, v):
            if pre_t:
                return call(i["valT"], i["wposT"], i["m"], i["du0"])
            return call(v.T, i["wpos"].T, i["m"], i["du0"])
        return f

    slope("base96_ms", s_base)
    slope("base64_ms", s_base64)
    slope("f32_ms", s_variant("f32"))
    slope("f32_noT_ms", s_variant("f32", pre_t=True))
    slope("build_only_ms", s_variant("build_only"))
    slope("int8_ms", s_variant("int8"))
    slope("bf16_ms", s_variant("bf16"))
    slope("int8_d64_ms", s_variant("int8", tile_d=64))

    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in out.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
