"""Round 4 of stage1 tile-kernel variants: cost decomposition.

tilebench2/3 ruled out acc dtype, tile depth, slice dynamism, and record
layout. This harness deletes parts of the round body to locate the cost,
and tests round/block geometry:

    full        production round body (reference)
    loads       record loads + 2D prep only
    abuild      loads + prep + the (WL,R,D) a-build, consumed cheaply
    bbuild      loads + prep + the (WL,R,64) b-build, consumed cheaply
    nodotacc    everything except the dot+acc (both builds)
    noacc       full, but acc overwritten instead of read-modify-write
    r256/r512   production body at 256/512 slots per round
    wl128       production body at 128-lane blocks
    bf16dots    f32 builds cast to bf16, exact hi/lo dots, f32 acc

Usage: python scripts/tilebench4.py [--iters N]
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

    TD = 96

    def make_variant(mode, R=128, WL=64, tile_d=TD):
        def kern(val_ref, wpos_ref, m_ref, du0_ref, tiles_out, acc_ref):
            mv = m_ref[:, 0]
            mmax = jnp.max(mv)
            du0v = du0_ref[:, 0]
            acc_ref[:] = jnp.zeros_like(acc_ref)

            def body(r):
                v = val_ref[:, pl.ds(r * R, R)].astype(jnp.int32)
                w = wpos_ref[:, pl.ds(r * R, R)]
                iota_s = r * R + jax.lax.broadcasted_iota(
                    jnp.int32, (1, R, 1), 1)
                iota_d = jax.lax.broadcasted_iota(
                    jnp.int32, (1, 1, tile_d), 2)
                iota_z = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 64), 2)
                valid2 = (iota_s[0] < mv[:, None]) & (w >= 0)
                d_rel = jnp.where(valid2, (w >> 6) - du0v[:, None], -1)
                iz = w & 63
                if mode == "loads":
                    acc_ref[0, 0, 0] += (jnp.sum(d_rel[:, 0])
                                         + jnp.sum(iz[:, 0])
                                         + jnp.sum(v[:, 0])).astype(
                                             acc_ref.dtype)
                    return r + 1
                ad = d_rel[:, :, None] == iota_d
                bz = iz[:, :, None] == iota_z
                if mode == "abuild":
                    a = jnp.where(ad, 1.0, 0.0)
                    acc_ref[:, :, 0] += a[:, 0, :]
                    return r + 1
                if mode == "bbuild":
                    b = jnp.where(bz, v[:, :, None].astype(jnp.float32), 0.0)
                    acc_ref[:, 0, :] += b[:, 0, :]
                    return r + 1
                a = jnp.where(ad, 1.0, 0.0)
                b = jnp.where(bz, v[:, :, None].astype(jnp.float32), 0.0)
                if mode == "nodotacc":
                    acc_ref[:, :, 0] += a[:, 0, :]
                    acc_ref[:, 0, :] += b[:, 0, :]
                    return r + 1
                dn = (((1,), (1,)), ((0,), (0,)))
                if mode == "bf16dots":
                    vhi = v >> 8
                    vlo = v & 0xFF
                    bhi = jnp.where(
                        bz, vhi[:, :, None].astype(jnp.float32),
                        0.0).astype(jnp.bfloat16)
                    blo = jnp.where(
                        bz, vlo[:, :, None].astype(jnp.float32),
                        0.0).astype(jnp.bfloat16)
                    abf = a.astype(jnp.bfloat16)
                    th = jax.lax.dot_general(
                        abf, bhi, dn, preferred_element_type=jnp.float32)
                    tl = jax.lax.dot_general(
                        abf, blo, dn, preferred_element_type=jnp.float32)
                    acc_ref[:] += th * 256.0 + tl
                    return r + 1
                t = jax.lax.dot_general(a, b, dn,
                                        preferred_element_type=jnp.float32)
                if mode == "noacc":
                    acc_ref[:] = t
                else:
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
            return call(v.T, i["wpos"].T, i["m"], i["du0"])
        return f

    ref_exe = compile_probe(lambda i: make_variant("full")(i, i["val"]))
    ref = np.asarray(ref_exe(inp))
    for mode, kw in (("bf16dots", {}), ("r256", dict(R=256)),
                     ("r512", dict(R=512)), ("wl128", dict(WL=128))):
        try:
            real = "full" if mode.startswith(("r", "wl")) else mode
            exe = compile_probe(
                lambda i, real=real, kw=kw: make_variant(real, **kw)(
                    i, i["val"]))
            got = np.asarray(exe(inp))
            ok = bool(np.array_equal(ref, got))
        except Exception as e:
            ok = f"FAIL: {str(e)[:160]}"
        out[f"{mode}_exact"] = ok
        print(f"{mode}_exact: {ok}", file=sys.stderr, flush=True)

    slope("full_ms", make_variant("full"))
    slope("loads_ms", make_variant("loads"))
    slope("abuild_ms", make_variant("abuild"))
    slope("bbuild_ms", make_variant("bbuild"))
    slope("nodotacc_ms", make_variant("nodotacc"))
    slope("noacc_ms", make_variant("noacc"))
    slope("r256_ms", make_variant("full", R=256))
    slope("r512_ms", make_variant("full", R=512))
    slope("wl128_ms", make_variant("full", WL=128))
    slope("bf16dots_ms", make_variant("bf16dots"))

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
