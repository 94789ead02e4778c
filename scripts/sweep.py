"""Tuning-knob sweep on the real device (slope method).

Measures, for each candidate Tuning, the slope cost of a stage on the
bench image: sync_states only (--what sync), the full entropy scan
(--what scan), or the tile-assembly stage1 (--what tiles, sweeping
tile_dot). Each config costs two compiles (K=1 and K=3 repetition
executables); costs are deltas so the tunnel RTT cancels.

Usage: python scripts/sweep.py [--what sync|scan|tiles] [--iters N] [image]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
# persistent compile cache: first tunnel compiles run 1-7 min (outliers 30+);
# repeat runs (e.g. the driver) become cache hits
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jpeggpu_tpu_jaxcache")


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
    what = "sync"
    argv = sys.argv[1:]
    if "--iters" in argv:
        i = argv.index("--iters")
        iters = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if "--what" in argv:
        i = argv.index("--what")
        what = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    kreps = 3
    if "--K" in argv:
        i = argv.index("--K")
        kreps = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    image = args[0] if args else DEFAULT_IMAGE

    data = open(image, "rb").read()
    stream = parse(data)
    plan = build_plan(stream)
    inputs = build_inputs(data, plan)
    cfg0 = plan.signature.scans[0].cfg
    inp = jax.device_put(inputs["scans"][0])
    out = {"image": image, "what": what, "iters": iters,
           "backend": jax.default_backend(), "lanes": cfg0.lanes}

    def mk_arrs(i, words=None):
        return H.ScanArrays(
            words=i["words"] if words is None else words,
            seg_of_subseq=i["seg_of_subseq"],
            seg_first_lane=i["seg_first_lane"],
            seg_num_subseq=i["seg_num_subseq"], maxcode=i["maxcode"],
            vsm=i["vsm"], huffval=i["huffval"])

    def slope(name, stage_fn, K=None):
        K = kreps if K is None else K
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
        try:
            for KK in (1, K):
                exe = jax.jit(rep_f(KK)).lower(inp).compile()
                ts[KK] = timeit(
                    lambda: np.asarray(exe(inp))[:1], iters) * 1e3
        except Exception as e:
            out[name] = f"FAIL: {str(e)[:160]}"
            print(f"{name}: FAILED {str(e)[:200]}", file=sys.stderr,
                  flush=True)
            return
        out[name] = round((ts[K] - ts[1]) / (K - 1), 2)
        print(f"{name}: {out[name]:.2f} ms  (t1 {ts[1]:.1f}, t{K} "
              f"{ts[K]:.1f}, compile+warm {time.time() - t0:.0f}s)",
              file=sys.stderr, flush=True)

    def with_tuning(**kw):
        return dataclasses.replace(cfg0, tuning=Tuning(**kw))

    if what == "sync":
        sync_cfgs = [
            ("base", {}),
            ("tree", dict(hv_lookup="tree")),
            ("bsearch", dict(category="bsearch")),
            ("shift", dict(refill="shift")),
            ("tbs", dict(hv_lookup="tree", category="bsearch",
                         refill="shift")),
            ("wf2", dict(wide_follow=2)),
            ("wf4", dict(wide_follow=4)),
            ("wf2_fw4096", dict(wide_follow=2, frontier_width=4096)),
            ("wf2_fw8192", dict(wide_follow=2, frontier_width=8192)),
            ("wf2_hw1024", dict(wide_follow=2, head_width=1024)),
            ("cf8", dict(chain_follow=8)),
            ("cf8_wf2", dict(chain_follow=8, wide_follow=2)),
            ("cf2_hw1024", dict(chain_follow=2, head_width=1024)),
            ("tbs_cf8", dict(hv_lookup="tree", category="bsearch",
                             refill="shift", chain_follow=8)),
            ("tbs_wf4", dict(hv_lookup="tree", category="bsearch",
                             refill="shift", wide_follow=4)),
            ("tbs_cf8_wf4", dict(hv_lookup="tree", category="bsearch",
                                 refill="shift", chain_follow=8,
                                 wide_follow=4)),
            # dot-gather era (ctx_gather=auto=dot): with the one-hot MXU
            # context gather, compacted rounds are cheap enough that wider
            # frontiers (fewer full-width phase-A rounds) may win
            ("fw4096", dict(frontier_width=4096)),
            ("fw8192", dict(frontier_width=8192)),
            ("fw12288", dict(frontier_width=12288)),
            ("fw8192_f4", dict(frontier_width=8192, chain_follow=4)),
            ("fw4096_hw2048", dict(frontier_width=4096, head_width=2048)),
            ("take", dict(ctx_gather="take")),
        ]
        for name, kw in sync_cfgs:
            if only is not None and name not in only:
                continue
            cfg = with_tuning(**kw)

            def s_sync(i, w, cfg=cfg):
                arrs = mk_arrs(i, w)
                ctx = H.make_ctx(cfg, arrs)
                p, c, z, n = H.sync_states(cfg, arrs, ctx)
                return p + n

            slope(f"sync_{name}_ms", s_sync)
    elif what == "tiles":
        from jpeggpu_tpu.ops import write_pallas as WP

        # records are computed once per executable; the rep loop repeats
        # only tiles_from_records, serialized by a vector dependence on val
        def tiles_rep(dot, KK):
            def f(i):
                arrs = mk_arrs(i)
                ctx = H.make_ctx(cfg0, arrs)
                p, c, z, n = H.sync_states(cfg0, arrs, ctx)
                n_off = H.symbol_offsets(cfg0, arrs, n)
                rec, m = H.decode_write_emit(cfg0, arrs, ctx, p, c, z,
                                             n_off)
                seg = arrs.seg_of_subseq
                pos0 = seg * cfg0.positions_per_seg + n_off
                du0 = jax.lax.cummax(pos0 >> 6)
                v32, wl = H.unpack_record(rec)
                val = v32.astype(jnp.int16)
                wpos = jnp.where(wl >= 0, wl + pos0[None, :], -1)
                inc = jnp.ones(cfg0.lanes, jnp.bool_)
                acc = jnp.zeros((), jnp.int16)
                tot = jnp.int32(0)
                for _ in range(KK):
                    v2 = jnp.where(acc == jnp.int16(-32768), val + 1, val)
                    tiles = WP.tiles_from_records(v2, wpos, m, du0, inc,
                                                  cfg0.tile_d, dot)
                    s = tiles[0, 0, 0].astype(jnp.int32) \
                        + tiles[-1, -1, -1].astype(jnp.int32)
                    acc = s.astype(jnp.int16)
                    tot = tot + s
                return tot.reshape(1)
            return f

        for dot in ("f32", "bf16", "int8"):
            t0 = time.time()
            ts = {}
            name = f"tiles_{dot}_ms"
            try:
                for KK in (1, 3):
                    exe = jax.jit(tiles_rep(dot, KK)).lower(inp).compile()
                    ts[KK] = timeit(
                        lambda: np.asarray(exe(inp))[:1], iters) * 1e3
            except Exception as e:
                out[name] = f"FAIL: {str(e)[:160]}"
                print(f"{name}: FAILED {str(e)[:200]}", file=sys.stderr,
                      flush=True)
                continue
            out[name] = round((ts[3] - ts[1]) / 2, 2)
            print(f"{name}: {out[name]:.2f} ms  (t1 {ts[1]:.1f}, t3 "
                  f"{ts[3]:.1f}, compile+warm {time.time() - t0:.0f}s)",
                  file=sys.stderr, flush=True)
    elif what == "super":
        from jpeggpu_tpu.ops import write_pallas as WP

        def super_rep(s_trim, dot, KK, W=None, expand_dot="f32"):
            def f(i):
                arrs = mk_arrs(i)
                ctx = H.make_ctx(cfg0, arrs)
                p, c, z, n = H.sync_states(cfg0, arrs, ctx)
                n_off = H.symbol_offsets(cfg0, arrs, n)
                rec, m = H.decode_write_emit(cfg0, arrs, ctx, p, c, z,
                                             n_off)
                seg = arrs.seg_of_subseq
                pos0 = seg * cfg0.positions_per_seg + n_off
                du0 = pos0 >> 6
                acc = jnp.zeros((), jnp.int16)
                tot = jnp.int32(0)
                for _ in range(KK):
                    r2 = jnp.where(acc == jnp.int16(-32768), rec + 1, rec)
                    out2 = WP.assemble_supertiles(
                        r2, m, du0, pos0, cfg0.total_positions,
                        cfg0.super_g, cfg0.super_w if W is None else W,
                        s_trim=s_trim, dot=dot, expand_dot=expand_dot,
                        group_du=cfg0.group_du)
                    s = out2[0].astype(jnp.int32) + out2[-1].astype(jnp.int32)
                    acc = s.astype(jnp.int16)
                    tot = tot + s
                return tot.reshape(1)
            return f

        def super_parts_rep(s_trim, dot, upto, KK):
            # decomposition mirror of assemble_supertiles: stop after
            # `upto` in {prep, stage1, expand} (full == the sweep above)
            import jax.numpy as jnp2

            C_DU = 64

            def f(i):
                arrs = mk_arrs(i)
                ctx = H.make_ctx(cfg0, arrs)
                p, c, z, n = H.sync_states(cfg0, arrs, ctx)
                n_off = H.symbol_offsets(cfg0, arrs, n)
                rec, m = H.decode_write_emit(cfg0, arrs, ctx, p, c, z,
                                             n_off)
                seg = arrs.seg_of_subseq
                pos0 = seg * cfg0.positions_per_seg + n_off
                v32w, wlw = H.unpack_record(rec)
                val = v32w.astype(jnp2.int16)
                wpos = jnp2.where(wlw >= 0, wlw + pos0[None, :], -1)
                du0_raw = jax.lax.cummax(pos0 >> 6)
                G, W = cfg0.super_g, cfg0.super_w
                total = cfg0.total_positions
                lanes = cfg0.lanes
                n_st = lanes // G
                n_groups = -(-(total // C_DU + 2) // 128)
                acc = jnp2.zeros((), jnp2.int16)
                tot = jnp2.int32(0)
                for _ in range(KK):
                    v2 = jnp2.where(acc == jnp2.int16(-32768), val + 1, val)
                    S = min(s_trim, val.shape[0])
                    val_t, wpos_t = v2[:S], wpos[:S]
                    du0 = du0_raw
                    base = du0.reshape(n_st, G)[:, 0]
                    base_l = jnp2.broadcast_to(
                        base[:, None], (n_st, G)).reshape(lanes)
                    sloti = jnp2.arange(S, dtype=jnp2.int32)[:, None]
                    valid = (sloti < m[None, :]) & (wpos_t >= 0)
                    du = wpos_t >> 6
                    max_du = jnp2.max(jnp2.where(valid, du, -1), axis=0)
                    include = (m > 0) & ((max_du - base_l) < 128)
                    q = WP._super_slab(base, max_du, include, G, n_groups, W)
                    d_rel = du - base_l[None, :]
                    ok = (valid & include[None, :] & (d_rel >= 0)
                          & (d_rel < 128))
                    pk = jnp2.where(ok, (d_rel << 6) | (wpos_t & 63),
                                    -1).astype(jnp2.int16)

                    def rows(x):
                        return x.reshape(S, n_st, G).transpose(
                            1, 0, 2).reshape(n_st, S * G)

                    vr = rows(val_t.astype(jnp2.int16))
                    pr = rows(pk)
                    if upto == "prep":
                        s = (vr[0, 0] + pr[-1, -1]).astype(jnp2.int32)
                        acc = s.astype(jnp2.int16)
                        tot = tot + s
                        continue
                    mmax_st = jnp2.max(
                        jnp2.where(include, m, 0).reshape(n_st, G),
                        axis=1).astype(jnp2.int32).reshape(n_st, 1)
                    stiles = WP.supertiles_from_records(vr, pr, mmax_st, G,
                                                        dot=dot)
                    if upto == "stage1":
                        s = stiles[0, 0, 0].astype(jnp2.int32) \
                            + stiles[-1, -1, -1].astype(jnp2.int32)
                        acc = s.astype(jnp2.int16)
                        tot = tot + s
                        continue
                    out2, _dc2 = WP.expand_supertiles(stiles, base, q,
                                                      n_groups,
                                                      min(W, n_st))
                    s = out2[0, 0].astype(jnp2.int32) \
                        + out2[-1, -1].astype(jnp2.int32)
                    acc = s.astype(jnp2.int16)
                    tot = tot + s
                return tot.reshape(1)
            return f

        super_cfgs = [("512_bf16", 512, "bf16"), ("256_bf16", 256, "bf16"),
                      ("512_int8", 512, "int8"), ("256_int8", 256, "int8"),
                      ("384_int8", 384, "int8"),
                      ("256_int8_w6", 256, "int8", 6),
                      ("256_int8_w4", 256, "int8", 4),
                      ("384_int8_w6", 384, "int8", 6),
                      ("256_int8_w6_expf32", 256, "int8", 6, "f32"),
                      ("256_int8_w6_expbf16", 256, "int8", 6, "bf16")]
        part_cfgs = [("parts_prep256", 256, "int8", "prep"),
                     ("parts_st1_256i8", 256, "int8", "stage1"),
                     ("parts_exp_256i8", 256, "int8", "expand")]
        for name, s_trim, dot, upto in part_cfgs:
            if only is not None and name not in only:
                continue
            t0 = time.time()
            ts = {}
            key = f"super_{name}_ms"
            try:
                for KK in (1, kreps):
                    exe = jax.jit(super_parts_rep(s_trim, dot, upto,
                                                  KK)).lower(inp).compile()
                    ts[KK] = timeit(
                        lambda: np.asarray(exe(inp))[:1], iters) * 1e3
            except Exception as e:
                out[key] = f"FAIL: {str(e)[:160]}"
                print(f"{key}: FAILED {str(e)[:200]}", file=sys.stderr,
                      flush=True)
                continue
            out[key] = round((ts[kreps] - ts[1]) / (kreps - 1), 2)
            print(f"{key}: {out[key]:.2f} ms  (t1 {ts[1]:.1f}, t{kreps} "
                  f"{ts[kreps]:.1f}, compile+warm {time.time() - t0:.0f}s)",
                  file=sys.stderr, flush=True)
        for name, s_trim, dot, *wext in super_cfgs:
            if only is not None and name not in only:
                continue
            W = wext[0] if wext else None
            exp = wext[1] if len(wext) > 1 else "f32"
            t0 = time.time()
            ts = {}
            key = f"super_{name}_ms"
            try:
                for KK in (1, kreps):
                    exe = jax.jit(super_rep(s_trim, dot, KK, W=W,
                                            expand_dot=exp)).lower(
                        inp).compile()
                    ts[KK] = timeit(
                        lambda: np.asarray(exe(inp))[:1], iters) * 1e3
            except Exception as e:
                out[key] = f"FAIL: {str(e)[:160]}"
                print(f"{key}: FAILED {str(e)[:200]}", file=sys.stderr,
                      flush=True)
                continue
            out[key] = round((ts[kreps] - ts[1]) / (kreps - 1), 2)
            print(f"{key}: {out[key]:.2f} ms  (t1 {ts[1]:.1f}, t{kreps} "
                  f"{ts[kreps]:.1f}, compile+warm {time.time() - t0:.0f}s)",
                  file=sys.stderr, flush=True)
    elif what == "scan":
        scan_cfgs = [
            ("base", {}),
            ("bf16", dict(tile_dot="bf16")),
            ("int8", dict(tile_dot="int8")),
            ("best_sync", dict(wide_follow=2)),  # edit after sync sweep
        ]
        for name, kw in scan_cfgs:
            cfg = with_tuning(**kw)

            def s_scan(i, w, cfg=cfg):
                return H.decode_scan(cfg, mk_arrs(i, w)).astype(jnp.int32)

            slope(f"scan_{name}_ms", s_scan)
    else:
        print(f"unknown --what {what}", file=sys.stderr)
        return 2

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
