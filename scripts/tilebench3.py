"""Round 3 of stage1 tile-kernel variants: record-slice layout experiments.

tilebench2 ruled out the accumulator (acc16 ~= f32) and the one-hot build
size (d64 ~= d96), leaving the per-round record access itself: the kernel
slices its lane-major (WL, s_cap) record refs with a DYNAMIC start on the
MINOR axis (``ref[:, pl.ds(r*R, R)]``), which Mosaic must lower as lane
rotations. Variants isolate that:

    f32          production formulation (dynamic minor slice, while loop)
    static       unrolled static rounds, each body under @pl.when(live):
                 static minor slices at 128-aligned offsets are free
    major        records kept slot-major (no XLA transpose at all!);
                 per-round slice on the MAJOR axis + in-kernel transpose
    major_static slot-major records, static major slices + @pl.when

Usage: python scripts/tilebench3.py [--iters N]
"""

from __future__ import annotations

import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tilebench import synth_records, timeit


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    iters = 10
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])

    val, wpos, m, du0 = synth_records()
    lanes, s_cap = val.shape[1], val.shape[0]
    inp = jax.device_put({
        "val": jnp.asarray(val), "wpos": jnp.asarray(wpos),
        "m": jnp.asarray(m), "du0": jnp.asarray(du0)})
    out = {"lanes": lanes, "s_cap": s_cap, "iters": iters,
           "backend": jax.default_backend()}

    def compile_probe(fn):
        return jax.jit(fn).lower(inp).compile()

    def run(exe):
        return lambda: np.asarray(jax.tree.leaves(exe(inp))[0])[..., :1]

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
        try:
            for KK in (1, K):
                exe = compile_probe(rep_f(KK))
                ts[KK] = timeit(run(exe), iters) * 1e3
        except Exception as e:
            out[name] = f"FAIL: {str(e)[:160]}"
            print(f"{name}: FAILED {str(e)[:200]}", file=sys.stderr,
                  flush=True)
            return
        out[name] = (ts[K] - ts[1]) / (K - 1)
        print(f"{name}: {out[name]:.2f} ms  (t1 {ts[1]:.1f}, t{K} {ts[K]:.1f},"
              f" compile+warm {time.time() - t0:.0f}s)", file=sys.stderr,
              flush=True)

    TD = 96
    R = 128
    WL = 64

    def round_work(acc_ref, v, w, slot0, mv, du0v, tile_d):
        """The production one-hot contraction for one (WL, R) record block
        (v, w lane-major int32)."""
        iota_s = slot0 + jax.lax.broadcasted_iota(jnp.int32, (1, R, 1), 1)
        iota_d = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tile_d), 2)
        iota_z = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 64), 2)
        valid = (iota_s < mv[:, None, None]) & (w[:, :, None] >= 0)
        d_rel = (w >> 6) - du0v[:, None]
        iz = w & 63
        ad = (d_rel[:, :, None] == iota_d) & valid
        bz = iz[:, :, None] == iota_z
        a = jnp.where(ad, 1.0, 0.0)
        b = jnp.where(bz, v[:, :, None].astype(jnp.float32), 0.0)
        acc_ref[:] += jax.lax.dot_general(
            a, b, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    def make_variant(mode, tile_d=TD):
        slot_major = mode.startswith("major")
        static = mode.endswith("static") or mode == "static"

        def kern(val_ref, wpos_ref, m_ref, du0_ref, tiles_out, acc_ref):
            mv = m_ref[:, 0]
            mmax = jnp.max(mv)
            du0v = du0_ref[:, 0]
            acc_ref[:] = jnp.zeros_like(acc_ref)

            def load(r_static_or_dyn):
                r = r_static_or_dyn
                if slot_major:
                    if isinstance(r, int):
                        v = val_ref[r * R:(r + 1) * R, :].astype(jnp.int32)
                        w = wpos_ref[r * R:(r + 1) * R, :]
                    else:
                        v = val_ref[pl.ds(r * R, R), :].astype(jnp.int32)
                        w = wpos_ref[pl.ds(r * R, R), :]
                    return v.T, w.T
                if isinstance(r, int):
                    return (val_ref[:, r * R:(r + 1) * R].astype(jnp.int32),
                            wpos_ref[:, r * R:(r + 1) * R])
                return (val_ref[:, pl.ds(r * R, R)].astype(jnp.int32),
                        wpos_ref[:, pl.ds(r * R, R)])

            if static:
                for r in range(s_cap // R):
                    @pl.when(r * R < mmax)
                    def _(r=r):
                        v, w = load(r)
                        round_work(acc_ref, v, w, r * R, mv, du0v, tile_d)
            else:
                def body(r):
                    v, w = load(r)
                    round_work(acc_ref, v, w, r * R, mv, du0v, tile_d)
                    return r + 1

                jax.lax.while_loop(lambda r: r * R < mmax, body,
                                   jnp.int32(0))
            tiles_out[:] = acc_ref[:].astype(jnp.int16)

        def call(val2, wpos2, mv, du0v):
            grid = (lanes // WL,)
            col_spec = pl.BlockSpec((WL, 1), lambda b: (b, 0),
                                    memory_space=pltpu.VMEM)
            if slot_major:
                rec_spec = pl.BlockSpec((s_cap, WL), lambda b: (0, b),
                                        memory_space=pltpu.VMEM)
            else:
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
                scratch_shapes=[pltpu.VMEM((WL, tile_d, 64), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(val2, wpos2, mv.reshape(-1, 1), du0v.reshape(-1, 1))

        def f(i, v):
            if slot_major:
                return call(v, i["wpos"], i["m"], i["du0"])
            return call(v.T, i["wpos"].T, i["m"], i["du0"])
        return f

    # correctness cross-check vs the lane-major dynamic formulation
    ref_exe = compile_probe(lambda i: make_variant("f32")(i, i["val"]))
    ref = np.asarray(ref_exe(inp))
    for mode in ("static", "major", "major_static"):
        try:
            exe = compile_probe(
                lambda i, mode=mode: make_variant(mode)(i, i["val"]))
            got = np.asarray(exe(inp))
            ok = bool(np.array_equal(ref, got))
        except Exception as e:
            ok = f"FAIL: {str(e)[:160]}"
        out[f"{mode}_exact"] = ok
        print(f"{mode}_exact: {ok}", file=sys.stderr, flush=True)

    slope("f32_ms", make_variant("f32"))
    slope("static_ms", make_variant("static"))
    slope("major_ms", make_variant("major"))
    slope("major_static_ms", make_variant("major_static"))

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
