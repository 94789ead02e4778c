"""Round 5 of stage1 tile-kernel variants: is the batched dot on the MXU?

tilebench4 isolated the batched (l=64)x[(128,96)x(128,64)] f32 dot at
~14.5 of ~18 ms — an effective 0.55 TFLOP/s, ~1% of the MXU. Hypothesis:
Mosaic lowers BATCHED dot_general on the VPU; only 2D dots hit the MXU.

    full        production round body (reference)
    control2d   same builds, the batched dot replaced by ONE 2D dot of the
                flattened operands (semantically garbage — cross-lane sums —
                but identical flops/operand sizes): if this is fast, 2D
                dots are MXU-fast and the batch dim is the problem
    full_d128   tile_d=128 (is M=96 forcing a VPU fallback?)
    padn128     b/N padded 64->128 (is N=64 forcing a VPU fallback?)

Usage: python scripts/tilebench5.py [--iters N]
"""

from __future__ import annotations

import json
import os
import sys
import time

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

    R = 128
    WL = 64

    def make_variant(mode, tile_d=96):
        def kern(val_ref, wpos_ref, m_ref, du0_ref, tiles_out, acc_ref):
            mv = m_ref[:, 0]
            mmax = jnp.max(mv)
            du0v = du0_ref[:, 0]
            acc_ref[:] = jnp.zeros_like(acc_ref)

            def body(r):
                v = val_ref[:, pl.ds(r * R, R)].astype(jnp.int32)
                w = wpos_ref[:, pl.ds(r * R, R)]
                slot_row = r * R + jax.lax.broadcasted_iota(
                    jnp.int32, (1, R), 1)
                iota_d = jax.lax.broadcasted_iota(
                    jnp.int32, (1, 1, tile_d), 2)
                iota_z = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 64), 2)
                valid2 = (slot_row < mv[:, None]) & (w >= 0)
                d_rel = jnp.where(valid2, (w >> 6) - du0v[:, None], -1)
                iz = w & 63
                ad = d_rel[:, :, None] == iota_d
                bz = iz[:, :, None] == iota_z
                a = jnp.where(ad, 1.0, 0.0)
                b = jnp.where(bz, v[:, :, None].astype(jnp.float32), 0.0)
                if mode == "control2d":
                    a2 = a.reshape(WL * R, tile_d)
                    b2 = b.reshape(WL * R, 64)
                    t = jax.lax.dot_general(
                        a2, b2, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc_ref[0] += t
                elif mode == "padn128":
                    bp = jnp.concatenate([b, jnp.zeros_like(b)], axis=2)
                    t = jax.lax.dot_general(
                        a, bp, (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    acc_ref[:] += t[:, :, :64]
                else:
                    t = jax.lax.dot_general(
                        a, b, (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    acc_ref[:] += t
                return r + 1

            jax.lax.while_loop(lambda r: r * R < mmax, body, jnp.int32(0))
            tiles_out[:] = acc_ref[:].astype(jnp.int16)

        def call(val2, wpos2, mv, du0v):
            grid = (lanes // WL,)
            col_spec = pl.BlockSpec((WL, 1), lambda b: (b, 0),
                                    memory_space=pltpu.VMEM)
            rec_spec = pl.BlockSpec((WL, s_cap), lambda b: (b, 0),
                                    memory_space=pltpu.VMEM)
            acc_shape = ((1, tile_d, 64) if mode == "control2d"
                         else (WL, tile_d, 64))
            return pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[rec_spec, rec_spec, col_spec, col_spec],
                out_specs=pl.BlockSpec(acc_shape, lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(
                    (lanes // WL if mode == "control2d" else lanes,
                     tile_d, 64), jnp.int16),
                scratch_shapes=[pltpu.VMEM(acc_shape, jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(val2, wpos2, mv.reshape(-1, 1), du0v.reshape(-1, 1))

        def f(i, v):
            return call(v.T, i["wpos"].T, i["m"], i["du0"])
        return f

    slope("full_ms", make_variant("full"))
    slope("control2d_ms", make_variant("control2d"))
    slope("full_d128_ms", make_variant("full", tile_d=128))
    slope("padn128_ms", make_variant("padn128"))

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
