"""Per-stage device timing harness (SURVEY §5 tracing/profiling).

Times the entropy-decode stages in isolation on the default JAX device and
prints a JSON stage budget. Each probe is a separately compiled executable
whose output is synchronized on a tiny slice (full-plane D2H is excluded;
see BENCH.md methodology). Stage costs are reported as deltas between
nested probes:

    rtt              empty-executable dispatch round trip
    sync             make_ctx + sync_states (Jacobi fixed point)
    emit  = e - s    decode_write_emit (dense (slot, lane) emission)
    asm   = a - e    assemble_coefficients (MXU tiles + windowed scatter)
    scatter = w - s  decode_write (element-granular scatter path)
    full_matmul      whole pipeline, write_mode=matmul
    full_scatter     whole pipeline, write_mode=scatter

Usage: python scripts/stagebench.py [image] [--iters N] [--skip-full]
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
    from jpeggpu_tpu.pipeline import build_inputs, build_plan, get_compiled
    from jpeggpu_tpu.reader import parse

    iters = 10
    argv = sys.argv[1:]
    if "--iters" in argv:
        i = argv.index("--iters")
        iters = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if "--only" in argv:  # value consumed where the probe sets read it
        i = argv.index("--only")
        argv = argv[:i] + argv[i + 2:]
    if "--mb" in argv:  # merged-batch width, read by the merged probes
        i = argv.index("--mb")
        argv = argv[:i] + argv[i + 2:]
    lane2d = "auto"
    if "--lane2d" in argv:
        i = argv.index("--lane2d")
        lane2d = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    # --tuning k=v[,k=v...]: override arbitrary Tuning fields for
    # same-session A/B probes (ints auto-converted)
    tune_kv = {}
    if "--tuning" in argv:
        i = argv.index("--tuning")
        for kv in argv[i + 1].split(","):
            k, v = kv.split("=")
            tune_kv[k] = int(v) if v.lstrip("-").isdigit() else v
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    image = args[0] if args else DEFAULT_IMAGE
    skip_full = "--skip-full" in sys.argv

    data = open(image, "rb").read()
    stream = parse(data)
    mp = stream.size_x * stream.size_y / 1e6
    plan = build_plan(stream, tuning=Tuning(lane2d=lane2d, **tune_kv))
    out_tuning = {"lane2d": lane2d, **tune_kv}
    inputs = build_inputs(data, plan)
    sp = plan.signature.scans[0]
    cfg = sp.cfg
    inp = jax.device_put({**inputs["scans"][0],
                          "qtables": inputs["qtables"]})

    def mk_arrs(i, words=None):
        return H.ScanArrays(
            words=i["words"] if words is None else words,
            seg_of_subseq=i["seg_of_subseq"],
            seg_first_lane=i["seg_first_lane"],
            seg_num_subseq=i["seg_num_subseq"], maxcode=i["maxcode"],
            vsm=i["vsm"], huffval=i["huffval"])

    out = {"image": image, "mp": round(mp, 2), "lanes": cfg.lanes,
           "num_subseq": cfg.num_subseq, "iters": iters,
           "backend": jax.default_backend(), "tuning": out_tuning}

    def compile_probe(fn):
        return jax.jit(fn).lower(inp).compile()

    def run(exe):
        return lambda: np.asarray(jax.tree.leaves(exe(inp))[0])[..., :1]

    t0 = time.time()
    empty = compile_probe(lambda i: i["maxcode"][0:1, 0:1] + 1)
    out["rtt_ms"] = timeit(run(empty), iters) * 1e3
    print(f"rtt: {out['rtt_ms']:.1f} ms  (compile+warm "
          f"{time.time() - t0:.0f}s)", file=sys.stderr, flush=True)

    def f_sync(i):
        arrs = mk_arrs(i)
        ctx = H.make_ctx(cfg, arrs)
        p, c, z, n = H.sync_states(cfg, arrs, ctx)
        return p[0:1] + c[0:1] + z[0:1] + n[0:1]

    def f_emit(i):
        arrs = mk_arrs(i)
        ctx = H.make_ctx(cfg, arrs)
        p, c, z, n = H.sync_states(cfg, arrs, ctx)
        n_off = H.symbol_offsets(cfg, arrs, n)
        rec, m = H.decode_write_emit(cfg, arrs, ctx, p, c, z, n_off)
        return rec[0:1, 0:1] + m[0:1]

    def f_asm(i):
        arrs = mk_arrs(i)
        ctx = H.make_ctx(cfg, arrs)
        p, c, z, n = H.sync_states(cfg, arrs, ctx)
        n_off = H.symbol_offsets(cfg, arrs, n)
        rec, m = H.decode_write_emit(cfg, arrs, ctx, p, c, z, n_off)
        pos0 = arrs.seg_of_subseq * cfg.positions_per_seg + n_off
        v32, wl = H.unpack_record(rec)
        wpos = jnp.where(wl >= 0, wl + pos0[None, :], -1)
        coeffs = H.assemble_coefficients(v32.astype(jnp.int16), wpos, m,
                                         cfg.total_positions)
        return coeffs[0:1]

    def f_scatter(i):
        arrs = mk_arrs(i)
        ctx = H.make_ctx(cfg, arrs)
        p, c, z, n = H.sync_states(cfg, arrs, ctx)
        n_off = H.symbol_offsets(cfg, arrs, n)
        return H.decode_write(cfg, arrs, ctx, p, c, z, n_off)[0:1]

    def f_tiles(i):
        from jpeggpu_tpu.ops import write_pallas as WP

        arrs = mk_arrs(i)
        ctx = H.make_ctx(cfg, arrs)
        p, c, z, n = H.sync_states(cfg, arrs, ctx)
        n_off = H.symbol_offsets(cfg, arrs, n)
        return WP.decode_write_tiles(cfg, arrs, ctx, p, c, z, n_off)[0:1]

    def f_tiles_stage1(i):
        from jpeggpu_tpu.ops import write_pallas as WP

        arrs = mk_arrs(i)
        ctx = H.make_ctx(cfg, arrs)
        p, c, z, n = H.sync_states(cfg, arrs, ctx)
        n_off = H.symbol_offsets(cfg, arrs, n)
        rec, m = H.decode_write_emit(cfg, arrs, ctx, p, c, z, n_off)
        seg = arrs.seg_of_subseq
        pos0 = seg * cfg.positions_per_seg + n_off
        du0 = jax.lax.cummax(pos0 >> 6)
        v32, wl = H.unpack_record(rec)
        val = v32.astype(jnp.int16)
        wpos = jnp.where(wl >= 0, wl + pos0[None, :], -1)
        tiles = WP.tiles_from_records(val, wpos, m, du0,
                                      jnp.ones(cfg.lanes, jnp.bool_),
                                      cfg.tile_d)
        return tiles[0:1, 0:1, 0:1]

    def _tail(i, upto):
        from jpeggpu_tpu.ops.dc import undelta_dc
        from jpeggpu_tpu.ops.idct import dequant_idct_plane
        from jpeggpu_tpu.ops.transpose import deinterleave

        arrs = mk_arrs(i)
        coeffs = H.decode_scan(cfg, arrs)
        if upto == "scan":
            return coeffs[0:1]
        comp_slots = tuple((c[1], c[2] * c[3]) for c in sp.comps)
        coeffs = undelta_dc(cfg, comp_slots, coeffs)
        if upto == "dc":
            return coeffs[0:1]
        t_comps = [(c[1], c[2], c[3], 0) for c in sp.comps]
        planes = deinterleave(cfg, coeffs, sp.num_mcus_x, sp.num_mcus_y,
                              t_comps)
        if upto == "deint":
            return sum(p[0:1, 0:1].astype(jnp.int32) for p in planes)
        outs = [dequant_idct_plane(p, i["qtables"][c[6]])
                for p, c in zip(planes, sp.comps)]
        return sum(o[0:1, 0:1].astype(jnp.int32) for o in outs)

    # --slope: the tunnel's per-dispatch RTT (~25-40 ms, noisy) swamps a
    # single-dispatch timing of a few-ms stage. Each slope probe runs the
    # stage K times inside ONE executable, serialized by a true vector
    # dependence (an always-false test of the previous rep's output perturbs
    # the next rep's input words — XLA can neither fold nor hoist it), and
    # reports (t_K - t_1) / (K - 1). Validated against hand-written kernels;
    # scalar-guard variants of this harness get CSE'd by XLA — keep the
    # dependence on the full output.
    def slope(name, stage_fn, K=3):
        def rep_f(KK):
            def f(i):
                words = i["words"]
                acc = jnp.zeros((), words.dtype)
                tot = jnp.int32(0)
                for _ in range(KK):
                    w2 = jnp.where(acc == jnp.asarray(0xDEADBEEF, words.dtype),
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

    # --destuff: slope of the DEVICE destuff path (ops/destuff.py) on the
    # bench scan — the datapoint that settles host-vs-device placement
    # (VERDICT r3 #6; reference keeps this stage on-device,
    # decode_destuff.cu:152-361, while our production default is the
    # threaded host pass at ~1.9 GB/s, native/destuff.cpp:11-14).
    if "--destuff" in sys.argv:
        from jpeggpu_tpu.ops.destuff import destuff_scan
        from jpeggpu_tpu.pipeline import build_plan as _bp

        plan2 = _bp(stream, host_destuff=False)
        inputs2 = build_inputs(data, plan2)
        sp2 = plan2.signature.scans[0]
        i2 = jax.device_put(inputs2["scans"][0])
        scan_bytes = stream.scans[0].end - stream.scans[0].begin

        def rep_f(KK):
            def f(i):
                raw = i["raw"]
                acc = jnp.zeros((), raw.dtype)
                tot = jnp.int32(0)
                for _ in range(KK):
                    r2 = jnp.where(acc == jnp.uint8(0xAB), raw + 1, raw)
                    words = destuff_scan(r2, i["seg_sub_offset"],
                                         sp2.cfg.lanes)
                    s = words[0].astype(jnp.int32)
                    acc = s.astype(raw.dtype)
                    tot = tot + s
                return tot.reshape(1)
            return f

        ts = {}
        for KK in (1, 3):
            exe = jax.jit(rep_f(KK)).lower(i2).compile()
            ts[KK] = timeit(lambda: np.asarray(exe(i2))[:1], iters) * 1e3
        out["destuff_dev_ms"] = (ts[3] - ts[1]) / 2
        out["scan_bytes"] = scan_bytes
        out["destuff_dev_gbs"] = round(
            scan_bytes / (out["destuff_dev_ms"] / 1e3) / 1e9, 3)
        print(f"device destuff: {out['destuff_dev_ms']:.2f} ms = "
              f"{out['destuff_dev_gbs']} GB/s on {scan_bytes} bytes "
              f"(t1 {ts[1]:.1f}, t3 {ts[3]:.1f})", file=sys.stderr,
              flush=True)
        print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                          for k, v in out.items()}))
        return 0

    # --slope2: per-stage chained probes. Each probe computes the stage's
    # PREFIX once (traced once, runs once per dispatch) and chains K
    # repetitions of ONLY the stage, serialized by an always-false
    # perturbation of one stage input from the previous rep's output —
    # stage-granular slope without re-running the whole prefix K times.
    if "--slope2" in sys.argv:
        from jpeggpu_tpu.ops import write_pallas as WP
        from jpeggpu_tpu.ops.dc import undelta_dc
        from jpeggpu_tpu.ops.idct_pallas import idct_stream_to_plane

        def chain(name, prefix_fn, stage_fn, K=3):
            # stage_fn(st, bump) -> output array; bump is 0 or 1 (int32)
            def rep_f(KK):
                def f(i):
                    st = prefix_fn(i)
                    acc = jnp.int32(0)
                    tot = jnp.int32(0)
                    for _ in range(KK):
                        bump = (acc == jnp.int32(0x7EADBEEF)).astype(
                            jnp.int32)
                        o = stage_fn(st, bump)
                        s = o.reshape(-1)[0].astype(jnp.int32)
                        acc = s
                        tot = tot + s
                    return tot.reshape(1)
                return f

            t0 = time.time()
            ts = {}
            for KK in (1, K):
                exe = compile_probe(rep_f(KK))
                ts[KK] = timeit(run(exe), iters) * 1e3
            out[name] = (ts[K] - ts[1]) / (K - 1)
            print(f"{name}: {out[name]:.2f} ms  (t1 {ts[1]:.1f}, "
                  f"t{K} {ts[K]:.1f}, compile+warm {time.time() - t0:.0f}s)",
                  file=sys.stderr, flush=True)

        def pre_sync(i):
            arrs = mk_arrs(i)
            ctx = H.make_ctx(cfg, arrs)
            p, c, z, n = H.sync_states(cfg, arrs, ctx)
            return i, arrs, ctx, p, c, z, n

        def st_emit(st, bump):
            i, arrs, ctx, p, c, z, n = st
            n_off = H.symbol_offsets(cfg, arrs, n)
            rec, m = H.decode_write_emit(cfg, arrs, ctx, p + bump, c,
                                         z, n_off)
            return rec[0] + m

        def pre_emit(i):
            i, arrs, ctx, p, c, z, n = pre_sync(i)
            n_off = H.symbol_offsets(cfg, arrs, n)
            rec, m = H.decode_write_emit(cfg, arrs, ctx, p, c, z, n_off)
            seg = arrs.seg_of_subseq
            pos0 = seg * cfg.positions_per_seg + n_off
            du0 = pos0 >> 6
            return rec, m, du0, pos0

        def mk_asm(upto):
            def st(st_, bump):
                rec, m, du0, pos0 = st_
                return WP.assemble_supertiles(
                    rec + bump.astype(rec.dtype), m, du0, pos0,
                    cfg.total_positions, cfg.super_g, cfg.super_w,
                    s_trim=cfg.tuning.s_trim,
                    dot=WP.resolve_super_dot(cfg.tuning.tile_dot),
                    expand_dot=cfg.tuning.expand_dot,
                    group_du=cfg.group_du, _upto=upto)
            return st

        st_asm = mk_asm(None)
        st_asm_prep = mk_asm("prep")
        st_asm_stage1 = mk_asm("stage1")

        def pre_scan(i):
            return H.decode_scan(cfg, mk_arrs(i))

        comp_slots = tuple((c[1], c[2] * c[3]) for c in sp.comps)

        def st_dc(coeffs, bump):
            return undelta_dc(cfg, comp_slots,
                              coeffs + bump.astype(coeffs.dtype))

        def pre_dc(i):
            return st_dc(pre_scan(i), jnp.int32(0))

        def st_dcv(coeffs, bump):
            from jpeggpu_tpu.ops.dc import undelta_dc_values

            return undelta_dc_values(cfg, comp_slots,
                                     coeffs + bump.astype(coeffs.dtype))

        def pre_dcv(i):
            coeffs = pre_scan(i)
            return coeffs, st_dcv(coeffs, jnp.int32(0))

        def pre_scan_dc(i):
            return H.decode_scan(cfg, mk_arrs(i), return_dc=True)

        def st_dcv2(st, bump):
            # DC un-delta from the tile-assembly side vector: no strided
            # slot-0 extraction of the coefficient stream
            from jpeggpu_tpu.ops.dc import undelta_dc_values

            coeffs, dc = st
            return undelta_dc_values(cfg, comp_slots,
                                     dc=dc + bump.astype(dc.dtype))

        def st_idct_all(st, bump):
            coeffs, dcv = st
            outs = [idct_stream_to_plane(
                coeffs + bump.astype(coeffs.dtype), inp["qtables"][c[6]],
                sp.num_mcus_x, sp.num_mcus_y, cfg.du_per_mcu,
                c[1], c[2], c[3], dc_override=dcv) for c in sp.comps]
            return sum(o[0, 0].astype(jnp.int32) for o in outs).reshape(1)

        def st_noff(st, bump):
            i, arrs, ctx, p, c, z, n = st
            return H.symbol_offsets(cfg, arrs, n + bump)

        def pre_ctx(i):
            arrs = mk_arrs(i)
            return arrs, H.make_ctx(cfg, arrs)

        def st_pass(st, bump):
            arrs, ctx = st
            blind_p = ctx.rel * 1024
            zeros = jnp.zeros(cfg.lanes, jnp.int32)
            p, c, z, n = H._decode_subseq_pass(cfg, arrs, ctx,
                                               blind_p + bump, zeros, zeros,
                                               ctx.lane_valid)
            return p + n

        def st_sync(st, bump):
            arrs, ctx = st
            import dataclasses as _dc
            ctx2 = _dc.replace(ctx, rel=ctx.rel + bump * 0,
                               seg_base_bits=ctx.seg_base_bits + bump)
            p, c, z, n = H.sync_states(cfg, arrs, ctx2)
            return p + n

        def st_2round(st, bump):
            # blind + one full shifted round: isolates the per-round cost
            # of the full-width Jacobi structure (pass + roll/freeze glue)
            arrs, ctx = st
            blind_p = ctx.rel * 1024 + bump * 0
            zeros = jnp.zeros(cfg.lanes, jnp.int32)
            p, c, z, n = H._decode_subseq_pass(
                cfg, arrs, ctx, blind_p + bump, zeros, zeros,
                ctx.lane_valid)
            sp = jnp.where(ctx.first_of_seg, blind_p, jnp.roll(p, 1))
            sc = jnp.where(ctx.first_of_seg, 0, jnp.roll(c, 1))
            sz = jnp.where(ctx.first_of_seg, 0, jnp.roll(z, 1))
            p2, c2, z2, n2 = H._decode_subseq_pass(cfg, arrs, ctx, sp, sc,
                                                   sz, ctx.lane_valid)
            return p2 + n2

        # merged-batch stage probes (--only msync_ms,...): the merged-lane
        # decode stages at B x single-image width, for locating where the
        # batch regime loses per-image device time vs the single slope
        MB = 8
        if "--mb" in sys.argv:
            MB = int(sys.argv[sys.argv.index("--mb") + 1])
        import dataclasses as _dc

        from jpeggpu_tpu.parallel import batch as PB

        merged_np = PB.merge_scan_inputs(sp, [inputs["scans"][0]] * MB)
        cfg_m = _dc.replace(cfg, lanes=MB * cfg.lanes,
                            num_subseq=MB * cfg.num_subseq)
        minp = jax.device_put({**merged_np, "qtables": inputs["qtables"]})

        def mk_marrs(i):
            return H.ScanArrays(
                words=i["words"], seg_of_subseq=i["seg_of_subseq"],
                seg_first_lane=i["seg_first_lane"],
                seg_num_subseq=i["seg_num_subseq"], maxcode=i["maxcode"],
                vsm=i["vsm"], huffval=i["huffval"])

        def chain_m(name, prefix_fn, stage_fn, K=3):
            def rep_f(KK):
                def f(i):
                    st = prefix_fn(i)
                    acc = jnp.int32(0)
                    tot = jnp.int32(0)
                    for _ in range(KK):
                        bump = (acc == jnp.int32(0x7EADBEEF)).astype(
                            jnp.int32)
                        o = stage_fn(st, bump)
                        s2 = o.reshape(-1)[0].astype(jnp.int32)
                        acc = s2
                        tot = tot + s2
                    return tot.reshape(1)
                return f

            t0 = time.time()
            ts = {}
            for KK in (1, K):
                exe = jax.jit(rep_f(KK)).lower(minp).compile()
                ts[KK] = timeit(
                    lambda: np.asarray(exe(minp))[:1], iters) * 1e3
            out[name] = (ts[K] - ts[1]) / (K - 1)
            print(f"{name} (B={MB}): {out[name]:.2f} ms  (t1 {ts[1]:.1f}, "
                  f"t{K} {ts[K]:.1f}, compile+warm {time.time() - t0:.0f}s)",
                  file=sys.stderr, flush=True)

        def mpre_ctx(i):
            arrs = mk_marrs(i)
            return arrs, H.make_ctx(cfg_m, arrs)

        def mst_sync(st, bump):
            arrs, cctx = st
            import dataclasses as _dc2
            ctx2 = _dc2.replace(cctx,
                                seg_base_bits=cctx.seg_base_bits + bump)
            p, c, z, n = H.sync_states(cfg_m, arrs, ctx2)
            return p + n

        def mpre_sync(i):
            arrs = mk_marrs(i)
            cctx = H.make_ctx(cfg_m, arrs)
            p, c, z, n = H.sync_states(cfg_m, arrs, cctx)
            return i, arrs, cctx, p, c, z, n

        def mst_emit(st, bump):
            i, arrs, cctx, p, c, z, n = st
            n_off = H.symbol_offsets(cfg_m, arrs, n)
            rec, mm = H.decode_write_emit(
                cfg_m, arrs, cctx, p + bump, c, z, n_off,
                pos_base=i["pos_base"], bound=i["pos_bound"],
                total_out=MB * cfg.total_positions)
            return rec[0] + mm

        def mpre_emit(i):
            i, arrs, cctx, p, c, z, n = mpre_sync(i)
            n_off = H.symbol_offsets(cfg_m, arrs, n)
            rec, mm = H.decode_write_emit(
                cfg_m, arrs, cctx, p, c, z, n_off,
                pos_base=i["pos_base"], bound=i["pos_bound"],
                total_out=MB * cfg.total_positions)
            pos0 = i["pos_base"] + n_off
            return rec, mm, pos0

        def mst_asm(st, bump):
            from jpeggpu_tpu.ops import write_pallas as WP

            rec, mm, pos0 = st
            T = cfg.total_positions
            tdu = T // 64
            L = cfg.lanes
            du0 = pos0 >> 6
            outs = []
            for b in range(MB):
                sl = slice(b * L, (b + 1) * L)
                co = WP.assemble_supertiles(
                    rec[:, sl] + bump, mm[sl], du0[sl] - b * tdu, pos0[sl],
                    T, cfg.super_g, cfg.super_w, s_trim=cfg.tuning.s_trim,
                    dot=WP.resolve_super_dot(cfg.tuning.tile_dot),
                    expand_dot=cfg.tuning.expand_dot,
                    group_du=cfg.group_du, super_d=cfg.super_d,
                    pos_offset=b * T)
                outs.append(co[0].astype(jnp.int32))
            return sum(outs).reshape(1)

        only = None
        if "--only" in sys.argv:
            only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
        mprobes = [
            ("msync_ms", mpre_ctx, mst_sync),
            ("memit_ms", mpre_sync, mst_emit),
            ("masm_ms", mpre_emit, mst_asm),
        ]
        if only is not None:
            for name, pre, st in mprobes:
                if name in only:
                    chain_m(name, pre, st)
        probes2 = [
            ("pass_ms", pre_ctx, st_pass),
            ("round2_ms", pre_ctx, st_2round),
            ("syncst_ms", pre_ctx, st_sync),
            ("emit_ms", pre_sync, st_emit),
            ("asm_ms", pre_emit, st_asm),
            ("asm_prep_ms", pre_emit, st_asm_prep),
            ("asm_stage1_ms", pre_emit, st_asm_stage1),
            ("dc_ms", pre_scan, st_dc),
            ("dcv_ms", pre_scan, st_dcv),
            ("dcv2_ms", pre_scan_dc, st_dcv2),
            ("idct_ms", pre_dcv, st_idct_all),
            ("noff_ms", pre_sync, st_noff),
        ]
        for name, pre, st in probes2:
            if only is not None and name not in only:
                continue
            chain(name, pre, st)
        print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                          for k, v in out.items()}))
        return 0

    if "--slope" in sys.argv:
        def s_sync(i, w):
            arrs = mk_arrs(i, w)
            ctx = H.make_ctx(cfg, arrs)
            p, c, z, n = H.sync_states(cfg, arrs, ctx)
            return p + n

        def s_emit(i, w):
            arrs = mk_arrs(i, w)
            ctx = H.make_ctx(cfg, arrs)
            p, c, z, n = H.sync_states(cfg, arrs, ctx)
            n_off = H.symbol_offsets(cfg, arrs, n)
            rec, m = H.decode_write_emit(cfg, arrs, ctx, p, c, z, n_off)
            return rec[0] + m

        def s_scan(i, w):
            return H.decode_scan(cfg, mk_arrs(i, w)).astype(jnp.int32)

        def s_tail(i, w):
            arrs = mk_arrs(i, w)
            coeffs = H.decode_scan(cfg, arrs)
            from jpeggpu_tpu.ops.dc import undelta_dc_values
            from jpeggpu_tpu.ops.idct_pallas import idct_stream_to_plane
            dcv = undelta_dc_values(
                cfg, tuple((c[1], c[2] * c[3]) for c in sp.comps), coeffs)
            outs = [idct_stream_to_plane(
                coeffs, i["qtables"][c[6]], sp.num_mcus_x, sp.num_mcus_y,
                cfg.du_per_mcu, c[1], c[2], c[3], dc_override=dcv)
                for c in sp.comps]
            return sum(o[0, 0].astype(jnp.int32) for o in outs)

        slope("sync_slope_ms", s_sync)
        slope("scan_slope_ms", s_scan)
        slope("emit_slope_ms", s_emit)
        slope("pipe_slope_ms", s_tail)
        out["write_slope_ms"] = out["scan_slope_ms"] - out["sync_slope_ms"]
        out["tail_slope_ms"] = out["pipe_slope_ms"] - out["scan_slope_ms"]
        print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                          for k, v in out.items()}))
        return 0

    cfg_p = dataclasses.replace(cfg, tuning=Tuning(entropy_backend="pallas"))

    def f_sync_pallas(i):
        arrs = mk_arrs(i)
        ctx = H.make_ctx(cfg_p, arrs)
        p, c, z, n = H.sync_states(cfg_p, arrs, ctx)
        return p[0:1] + c[0:1] + z[0:1] + n[0:1]

    def f_scan_pallas(i):
        arrs = mk_arrs(i)
        return H.decode_scan(cfg_p, arrs)[0:1]

    probes = [("sync_ms", f_sync), ("sync_emit_ms", f_emit),
              ("sync_emit_asm_ms", f_asm), ("sync_scatter_ms", f_scatter),
              ("sync_emit_tiles_ms", f_tiles),
              ("sync_pallas_ms", f_sync_pallas),
              ("scan_pallas_ms", f_scan_pallas)]
    if "--only-pallas" in sys.argv:
        probes = probes[5:]
    if "--only-tiles" in sys.argv:
        probes = [("sync_ms", f_sync), ("sync_emit_ms", f_emit),
                  ("sync_emit_t1_ms", f_tiles_stage1),
                  ("sync_emit_tiles_ms", f_tiles)]
    if "--tail" in sys.argv:
        probes = [("scan_ms", lambda i: _tail(i, "scan")),
                  ("scan_dc_ms", lambda i: _tail(i, "dc")),
                  ("scan_deint_ms", lambda i: _tail(i, "deint")),
                  ("scan_idct_ms", lambda i: _tail(i, "idct"))]
    for name, fn in probes:
        t0 = time.time()
        exe = compile_probe(fn)
        out[name] = timeit(run(exe), iters) * 1e3
        print(f"{name}: {out[name]:.1f} ms  (compile+warm "
              f"{time.time() - t0:.0f}s)", file=sys.stderr, flush=True)

    if "sync_emit_ms" in out and "sync_ms" in out:
        out["emit_ms"] = out["sync_emit_ms"] - out["sync_ms"]
        if "sync_emit_asm_ms" in out:
            out["asm_ms"] = out["sync_emit_asm_ms"] - out["sync_emit_ms"]
        if "sync_scatter_ms" in out:
            out["scatter_write_ms"] = out["sync_scatter_ms"] - out["sync_ms"]
        if "sync_emit_tiles_ms" in out:
            out["tiles_ms"] = out["sync_emit_tiles_ms"] - out["sync_emit_ms"]
    if "scan_pallas_ms" in out and "sync_pallas_ms" in out:
        out["write_pallas_ms"] = out["scan_pallas_ms"] - out["sync_pallas_ms"]

    full_modes = []
    if "--tail" in sys.argv:
        skip_full = True
    if not skip_full:
        full_modes = [("auto", Tuning())]
        if "--only-pallas" not in sys.argv and "--only-tiles" not in sys.argv:
            full_modes += [
                ("fused", Tuning(entropy_backend="pallas",
                                 write_mode="fused")),
                ("scatter", Tuning(entropy_backend="xla",
                                   write_mode="scatter"))]
    for mode, tuning in full_modes:
        t0 = time.time()
        plan_m = build_plan(stream, tuning=tuning)
        exe = get_compiled(plan_m, inputs, True)
        dev_scans = jax.device_put(inputs["scans"])
        dev_qt = jax.device_put(inputs["qtables"])

        def go():
            o = exe(dev_scans, dev_qt)
            np.asarray(o[0][0:1, 0:1])

        out[f"full_{mode}_ms"] = timeit(go, iters) * 1e3
        out[f"full_{mode}_mps"] = mp / (out[f"full_{mode}_ms"] / 1e3)
        print(f"full_{mode}: {out[f'full_{mode}_ms']:.1f} ms = "
              f"{out[f'full_{mode}_mps']:.1f} MP/s  (compile+warm "
              f"{time.time() - t0:.0f}s)", file=sys.stderr, flush=True)

    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in out.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
