"""Prototype: supertile record placement (stage1 rewrite candidate).

The production tiles kernel (ops/write_pallas.py tiles_from_records) lowers
to 64 batched (128-contraction x tile_d x 64) dots per round-block; Mosaic
runs those as ~49K tiny sequential MXU ops (~13.7 ms measured on v5e
2026-08-19). This prototype groups G consecutive lanes into one *supertile*:
all G lanes contract into a single (D_super, 64) output via ONE plain 2D dot
per round (k = G*128), which the MXU can stream at full rate.

Formulation notes (Mosaic constraints, v5e 2026-08-19):
- in-kernel reshape (G, 128) -> (G*128, 1) does NOT lower (minor-dim merge);
  instead records are pre-interleaved in XLA to (n_st, s_cap*G) rows with
  column = slot*G + g, so each round reads a contiguous (1, G*128) chunk.
- both one-hot operands are built by ROW broadcasts -- a_t (D, k) from
  iota_d column vs dd row, b_t (64, k) from iota_z column vs zz row -- and
  contracted on their minor axes: dot_general(a_t, b_t, ((1,), (1,))).

Usage:
  PYTHONPATH= JAX_PLATFORMS=cpu python scripts/supertile_proto.py --cpu ...
  python scripts/supertile_proto.py [--G 8] [--D 128] [--SB 8] [--iters N]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

DEFAULT_IMAGE = "/root/reference/images/IMG_6510.JPG"
RECORDS_NPZ = "/tmp/records.npz"


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    argv = sys.argv[1:]

    def opt(name, default, cast=int):
        if name in argv:
            i = argv.index(name)
            v = cast(argv[i + 1])
            del argv[i:i + 2]
            return v
        return default

    G = opt("--G", 8)
    D = opt("--D", 128)
    SB = opt("--SB", 8)
    iters = opt("--iters", 10)
    interpret = "--cpu" in argv

    d = np.load(RECORDS_NPZ)
    val, wpos, m, pos0 = d["val"], d["wpos"], d["m"], d["pos0"]
    lanes = val.shape[1]
    s_cap = val.shape[0]
    assert lanes % (SB * G) == 0
    n_st = lanes // G

    # ---- host-side prep (numpy; becomes XLA in production) ----
    du0 = np.maximum.accumulate(pos0 >> 6)
    st_of_lane = np.arange(lanes) // G
    base = du0[::G].copy()
    slot = np.arange(s_cap)[:, None]
    valid = (slot < m[None, :]) & (wpos >= 0)
    du = wpos >> 6
    d_rel = du - base[st_of_lane][None, :]
    max_du = np.max(np.where(valid, du, -1), axis=0)
    include = ((max_du - base[st_of_lane]) < D) & (m > 0)
    n_left = int((~include & (m > 0)).sum())
    ok = valid & include[None, :] & (d_rel >= 0) & (d_rel < D)
    pk = np.where(ok, (d_rel << 6) | (wpos & 63), -1).astype(np.int16)
    print(f"n_st={n_st} leftover_lanes={n_left} "
          f"records={int(valid.sum())} placed={int(ok.sum())}",
          file=sys.stderr, flush=True)

    # numpy reference supertiles
    ref = np.zeros((n_st, D, 64), np.int16)
    ss, ll = np.nonzero(ok)
    np.add.at(ref, (st_of_lane[ll], d_rel[ss, ll], (wpos & 63)[ss, ll]),
              val[ss, ll])

    # interleaved row layout: row st, column s*G + g
    def rows(x):
        return np.ascontiguousarray(
            x.reshape(s_cap, n_st, G).transpose(1, 0, 2).reshape(
                n_st, s_cap * G))

    pk_r = rows(pk)
    val_r = rows(val.astype(np.int16))
    mmax_st = np.where(include, m, 0).reshape(n_st, G).max(axis=1) \
        .astype(np.int32).reshape(n_st, 1)
    K = G * 128  # contraction chunk per round

    def kernel(val_ref, pk_ref, m_ref, iota_d_ref, iota_z_ref, out_ref,
               acc_ref):
        iota_d = iota_d_ref[:, 0][:, None]   # (D, 1)
        iota_z = iota_z_ref[:, 0][:, None]   # (64, 1)
        for st in range(SB):
            mmax = jnp.max(m_ref[st])
            acc_ref[:] = jnp.zeros_like(acc_ref)

            def round_body(r):
                v = val_ref[st, pl.ds(r * K, K)][None, :].astype(jnp.float32)
                p = pk_ref[st, pl.ds(r * K, K)][None, :].astype(jnp.int32)
                dd = jnp.where(p >= 0, p >> 6, -1)
                zz = jnp.where(p >= 0, p & 63, -1)
                a_t = jnp.where(dd == iota_d, 1.0, 0.0)        # (D, K)
                b_t = jnp.where(zz == iota_z, v, 0.0)          # (64, K)
                acc_ref[:] += jax.lax.dot_general(
                    a_t, b_t, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return r + 1

            jax.lax.while_loop(lambda r: r * 128 < mmax, round_body,
                               jnp.int32(0))
            out_ref[st] = acc_ref[:].astype(jnp.int16)

    iota_d_in = jnp.arange(D, dtype=jnp.int32).reshape(D, 1)
    iota_z_in = jnp.arange(64, dtype=jnp.int32).reshape(64, 1)
    rec_spec = pl.BlockSpec((SB, s_cap * G), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)

    pk_d = jnp.asarray(pk_r)
    m_d = jnp.asarray(mmax_st)

    def build(valx):
        return pl.pallas_call(
            kernel,
            grid=(n_st // SB,),
            in_specs=[rec_spec, rec_spec,
                      pl.BlockSpec((SB, 1), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((D, 1), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((64, 1), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((SB, D, 64), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_st, D, 64), jnp.int16),
            scratch_shapes=[pltpu.VMEM((D, 64), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(valx, pk_d, m_d, iota_d_in, iota_z_in)

    val_d = jnp.asarray(val_r)
    t0 = time.time()
    out = np.asarray(jax.jit(build)(val_d))
    print(f"compile+run {time.time() - t0:.0f}s", file=sys.stderr, flush=True)
    exact = np.array_equal(out, ref)
    print(f"exact={exact}", file=sys.stderr, flush=True)
    if not exact:
        bad = np.nonzero((out != ref).any(axis=(1, 2)))[0]
        print(f"  bad supertiles: {bad[:10]} of {n_st}", file=sys.stderr)
        return 1

    if interpret:
        print("OK (interpret mode, no timing)")
        return 0

    def rep_f(KK):
        def f(v):
            acc = jnp.zeros((), jnp.int16)
            tot = jnp.int32(0)
            for _ in range(KK):
                v2 = jnp.where(acc == jnp.int16(-32768), v + 1, v)
                tiles = build(v2)
                s = tiles[0, 0, 0].astype(jnp.int32) + \
                    tiles[-1, -1, -1].astype(jnp.int32)
                acc = s.astype(jnp.int16)
                tot = tot + s
            return tot.reshape(1)
        return f

    def timeit(fn, it):
        for _ in range(2):
            fn()
        ts = []
        for _ in range(it):
            t = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t)
        return sorted(ts)[len(ts) // 2]

    ts = {}
    for KK in (1, 5):
        exe = jax.jit(rep_f(KK)).lower(val_d).compile()
        ts[KK] = timeit(lambda: np.asarray(exe(val_d))[:1], iters) * 1e3
        print(f"t{KK}={ts[KK]:.1f} ms", file=sys.stderr, flush=True)
    slope = (ts[5] - ts[1]) / 4
    print(f"supertile G={G} D={D} SB={SB}: {slope:.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
