"""Fused Pallas TPU kernels for the per-symbol entropy-decode loops.

The XLA formulation of the symbol loop (ops/huffman.py) re-reads the
(34, lanes) bit window, the packed Huffman tables and all decoder state
from HBM on every loop iteration — a fixed ~12 MB/step floor that puts the
12 MP sync pass at ~50 ms. These kernels hold everything in VMEM across the
whole loop (the TPU answer to the reference keeping its bit-reader state in
registers/shared memory, decode_huffman.cu:302-394,
decode_huffman_reader.hpp:204-219):

- :func:`subseq_pass` — one speculative/sync decode pass over each lane's
  own subsequence (drop-in for the XLA ``_decode_subseq_pass``); used for
  every Jacobi round of ``sync_states``.
- :func:`decode_write_fused` — the final writing decode. Instead of
  scattering coefficients element by element (~7 ns/slot on XLA:TPU), each
  lane accumulates its output into a VMEM (D, 64) data-unit window as it
  decodes; the windows leave the kernel as one dense (D, 64, lanes) record
  tensor, placed into the coefficient stream by a single windowed
  scatter-add (one index per lane, 64-wide rows). Lanes whose subsequence
  spans more than D data units (low-entropy tails) freeze with their exact
  resume state and finish on the narrow XLA straggler path
  (``scatter_finish``).

Both kernels reuse the exact symbol-decode functions of ops/huffman.py on
VMEM-resident values, so device semantics are shared with the XLA path by
construction. On CPU backends the kernels run in Pallas interpret mode,
which keeps the full test matrix executable everywhere.
"""

from __future__ import annotations

import functools
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C

# data-unit window depth of the fused write kernel: covers subsequences
# spanning up to _WRITE_D data units (~99% of real content; the rest resumes
# on the straggler path). VMEM cost: _WRITE_D * 64 * block * 2B.
_WRITE_D = 32
_SYNC_BLOCK = 2048
# write-kernel lane block and unroll are VMEM-bound: the loop body holds the
# (D, 64, block) accumulator plus ~unroll live select temporaries
_WRITE_BLOCK = 256
_WRITE_UNROLL = 4


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _block(width: int, cap: int) -> int:
    for w in (cap, 1024, 512, 256):
        if w <= cap and width % w == 0:
            return w
    return width


def _use_2d(cfg) -> bool:
    """Fold the lane axis to (8, w/8) inside the kernels?

    1D (lanes,) state vectors lower to (1, lanes) vregs — ONE of 8 sublanes
    useful — so every per-symbol vector op pays 8x its useful width. The 2D
    fold costs nothing (a bitcast reshape at the boundary; all lane
    coupling — rolls, shifts — happens outside the kernels) and recovers
    full sublanes. Eligible only with the shape-generic symbol-loop
    formulations (the TPU defaults); the one-hot/mask forms carry
    (rows, lanes)-shaped constructions that assume a 1D lane axis."""
    from . import huffman as H

    mode = cfg.tuning.lane2d
    if mode == "off":
        return False
    eligible = (cfg.fast_tables
                and H._resolve_refill(cfg) == "shift"
                and H._resolve_hv_lookup(cfg) == "tree"
                and H._resolve_category(cfg) == "bsearch")
    return eligible


def _row_spec(w):
    return pl.BlockSpec((1, w), lambda b: (0, b), memory_space=pltpu.VMEM)


def _full_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b: (0,) * nd, memory_space=pltpu.VMEM)


def _make_ctx_ns(cfg, window, we, sb, es, lw, hv, lim, dvsm, vsm0):
    """Namespace duck-typing ops.huffman._Ctx for the shared decode core."""
    return SimpleNamespace(
        window=window, hv_packed=hv, word_end=we, seg_base_bits=sb,
        end_subseq=es, lane_word0=lw, limits=lim, dvsm=dvsm, vsm0=vsm0)


def _sync_kernel(cfg, two_d, window_ref, we_ref, sb_ref, es_ref, lw_ref,
                 hv_ref, lim_ref, dvsm_ref, vsm0_ref, mc_ref, vsm_ref,
                 p0_ref, c0_ref, z0_ref, a0_ref,
                 p_out, c_out, z_out, n_out, st_ref):
    from . import huffman as H

    rd = (lambda r: r[...]) if two_d else (lambda r: r[0])
    ctx = _make_ctx_ns(cfg, window_ref[:], rd(we_ref), rd(sb_ref),
                       rd(es_ref), rd(lw_ref), hv_ref[:], lim_ref[:],
                       dvsm_ref[:], vsm0_ref[0])
    arrs = SimpleNamespace(maxcode=mc_ref[:], vsm=vsm_ref[:])
    active0 = (rd(a0_ref) != 0) & (rd(p0_ref) < ctx.end_subseq)
    # per-lane loop state lives in a VMEM scratch; the while_loop carries
    # only a scalar (Mosaic cannot legalize vector loop carries in the
    # layouts this kernel produces)
    st_ref[0] = rd(p0_ref)
    st_ref[1] = rd(c0_ref)
    st_ref[2] = rd(z0_ref)
    st_ref[3] = jnp.zeros_like(rd(p0_ref))
    st_ref[4] = active0.astype(jnp.int32)

    def body(_):
        p = st_ref[0]
        c = st_ref[1]
        z = st_ref[2]
        n = st_ref[3]
        active = st_ref[4] != 0
        # one rolling-buffer refill per iteration, funnel reads per symbol
        buf, base = H._refill_buf(cfg, ctx, p)
        for _u in range(H._resolve_unroll(cfg)):
            p, c, z, run, commit, active = H._symbol_step_buf(
                cfg, arrs, ctx, buf, base, p, c, z, active)
            n = jnp.where(commit, n + run + 1, n)
        st_ref[0] = p
        st_ref[1] = c
        st_ref[2] = z
        st_ref[3] = n
        st_ref[4] = active.astype(jnp.int32)
        return jnp.any(active)

    jax.lax.while_loop(lambda go: go, body, jnp.any(active0))
    if two_d:
        p_out[...] = st_ref[0]
        c_out[...] = st_ref[1]
        z_out[...] = st_ref[2]
        n_out[...] = st_ref[3]
    else:
        p_out[0] = st_ref[0]
        c_out[0] = st_ref[1]
        z_out[0] = st_ref[2]
        n_out[0] = st_ref[3]


def subseq_pass(cfg, arrs, ctx, p0, c0, z0, active0):
    """Pallas drop-in for ops.huffman._decode_subseq_pass_xla.

    Decodes each lane's own subsequence from the given start state entirely
    in VMEM. Returns (p, c, z, n). With Tuning.lane2d (the default on the
    TPU knob combo) the lane axis is folded to (8, w/8) across the kernel
    boundary — a free bitcast reshape that recovers the 7/8 of sublane
    throughput the 1D (1, lanes) layout wastes."""
    width = p0.shape[0]
    two_d = _use_2d(cfg) and width % 8 == 0
    if two_d:
        w = _block(width // 8, _SYNC_BLOCK // 8) * 8
        w8 = w // 8
        grid = (width // w,)

        def row(x, dtype=jnp.int32):
            return x.astype(dtype).reshape(8, width // 8)

        lane_spec = pl.BlockSpec((8, w8), lambda b: (0, b),
                                 memory_space=pltpu.VMEM)
        win_in = ctx.window.reshape(34, 8, width // 8)
        win_spec = pl.BlockSpec((34, 8, w8), lambda b: (0, 0, b),
                                memory_space=pltpu.VMEM)
        out_sh = (8, width // 8)
        scratch = pltpu.VMEM((5, 8, w8), jnp.int32)
    else:
        w = _block(width, _SYNC_BLOCK)
        grid = (width // w,)

        def row(x, dtype=jnp.int32):
            return x.astype(dtype).reshape(1, width)

        lane_spec = _row_spec(w)
        win_in = ctx.window
        win_spec = pl.BlockSpec((34, w), lambda b: (0, b),
                                memory_space=pltpu.VMEM)
        out_sh = (1, width)
        scratch = pltpu.VMEM((5, w), jnp.int32)

    args = (
        win_in,
        row(ctx.word_end), row(ctx.seg_base_bits), row(ctx.end_subseq),
        row(ctx.lane_word0),
        ctx.hv_packed, ctx.limits, ctx.dvsm, ctx.vsm0.reshape(1, -1),
        arrs.maxcode, arrs.vsm,
        row(p0), row(c0), row(z0), row(active0),
    )
    in_specs = [
        win_spec,
        lane_spec, lane_spec, lane_spec, lane_spec,
        _full_spec(ctx.hv_packed.shape), _full_spec(ctx.limits.shape),
        _full_spec(ctx.dvsm.shape), _full_spec((1, ctx.vsm0.shape[0])),
        _full_spec(arrs.maxcode.shape), _full_spec(arrs.vsm.shape),
        lane_spec, lane_spec, lane_spec, lane_spec,
    ]
    out_shape = [jax.ShapeDtypeStruct(out_sh, jnp.int32)] * 4
    out_specs = [lane_spec] * 4
    p, c, z, n = pl.pallas_call(
        functools.partial(_sync_kernel, cfg, two_d),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[scratch],
        interpret=_interpret(),
    )(*args)
    if two_d:
        return (p.reshape(width), c.reshape(width), z.reshape(width),
                n.reshape(width))
    return p[0], c[0], z[0], n[0]


_EMIT_BLOCK = 512


def _emit_kernel(cfg, s_cap, two_d, window_ref, we_ref, sb_ref, es_ref,
                 lw_ref, hv_ref, lim_ref, dvsm_ref, vsm0_ref, mc_ref,
                 vsm_ref, p0_ref, c0_ref, z0_ref, pos0_ref, bound_ref,
                 a0_ref, rec_out, m_out, st_ref):
    from . import huffman as H

    rd = (lambda r: r[...]) if two_d else (lambda r: r[0])
    ctx = _make_ctx_ns(cfg, window_ref[:], rd(we_ref), rd(sb_ref),
                       rd(es_ref), rd(lw_ref), hv_ref[:], lim_ref[:],
                       dvsm_ref[:], vsm0_ref[0])
    arrs = SimpleNamespace(maxcode=mc_ref[:], vsm=vsm_ref[:])
    bound = rd(bound_ref)
    pos_start = rd(pos0_ref)  # lane-local record positions rebase here
    unroll = H._resolve_unroll(cfg)
    active0 = ((rd(a0_ref) != 0) & (rd(p0_ref) < ctx.end_subseq)
               & (pos_start < bound))
    st_ref[0] = rd(p0_ref)
    st_ref[1] = rd(c0_ref)
    st_ref[2] = rd(z0_ref)
    st_ref[3] = pos_start
    st_ref[4] = active0.astype(jnp.int32)
    st_ref[5] = jnp.zeros_like(rd(p0_ref))  # m: one past last written slot

    def body(carry):
        k, _ = carry
        p = st_ref[0]
        c = st_ref[1]
        z = st_ref[2]
        pos = st_ref[3]
        active = st_ref[4] != 0
        m = st_ref[5]
        buf, base = H._refill_buf(cfg, ctx, p)
        rows_r = []
        for u in range(unroll):
            data, stall = H._load32_buf(ctx, p, buf, base)
            length, sym, run = H._decode_symbol(cfg, arrs, ctx, data, c, z)
            ok = active & (pos < bound) & ~stall
            fits = p + length <= ctx.end_subseq
            commit = ok & fits
            active = active & ~(ok & ~fits) & (pos < bound)
            wp = pos + run
            v = jnp.where(commit & (wp < bound), sym, 0)
            rows_r.append(jnp.where(
                commit, H.pack_record(v, wp - pos_start), H._REC_INERT))
            p = jnp.where(commit, p + length, p)
            z_new = z + run + 1
            wrap = z_new >= 64
            c_new = jnp.where(wrap, c + 1, c)
            c_new = jnp.where(c_new >= cfg.du_per_mcu, 0, c_new)
            z = jnp.where(commit, jnp.where(wrap, 0, z_new), z)
            c = jnp.where(commit, c_new, c)
            pos = jnp.where(commit, wp + 1, pos)
            m = jnp.where(commit, k * unroll + u + 1, m)
        # slots never reached stay uninitialized: every consumer gates on
        # slot < m (per lane), which only covers written rows
        rec_out[pl.ds(k * unroll, unroll)] = jnp.stack(rows_r)
        st_ref[0] = p
        st_ref[1] = c
        st_ref[2] = z
        st_ref[3] = pos
        st_ref[4] = active.astype(jnp.int32)
        st_ref[5] = m
        k = k + 1
        return k, jnp.any(active) & (k * unroll < s_cap)

    jax.lax.while_loop(lambda s: s[1], body,
                       (jnp.int32(0), jnp.any(active0)))
    if two_d:
        m_out[...] = st_ref[5]
    else:
        m_out[0] = st_ref[5]


def emit_pass(cfg, arrs, ctx, sp, sc, sz, pos0, bound_full, active0, s_cap):
    """Pallas drop-in for the loop of ops.huffman.decode_write_emit.

    Decodes each lane's subsequence from its synced start state entirely in
    VMEM, emitting each committed symbol as ONE packed int32 record
    ``(val << 16) | (local_pos & 0xFFFF)`` at (slot, lane) — half the HBM
    write traffic of separate value/position buffers (see
    ops.huffman.pack_record). Returns (rec int32[s_cap, lanes],
    m int32[lanes]). Lane axis folded (8, w/8) in-kernel when eligible
    (see subseq_pass); the emission buffer comes back with the fold undone
    by a free reshape.
    """
    width = pos0.shape[0]
    two_d = _use_2d(cfg) and width % 8 == 0
    if two_d:
        w = _block(width // 8, _EMIT_BLOCK // 4) * 8
        w8 = w // 8
        grid = (width // w,)

        def row(x):
            return x.astype(jnp.int32).reshape(8, width // 8)

        lane_spec = pl.BlockSpec((8, w8), lambda b: (0, b),
                                 memory_space=pltpu.VMEM)
        win_in = ctx.window.reshape(34, 8, width // 8)
        win_spec = pl.BlockSpec((34, 8, w8), lambda b: (0, 0, b),
                                memory_space=pltpu.VMEM)
        emit_sh = (s_cap, 8, width // 8)
        emit_spec = pl.BlockSpec((s_cap, 8, w8), lambda b: (0, 0, b),
                                 memory_space=pltpu.VMEM)
        m_sh = (8, width // 8)
        scratch = pltpu.VMEM((6, 8, w8), jnp.int32)
    else:
        w = _block(width, _EMIT_BLOCK)
        grid = (width // w,)

        def row(x):
            return x.astype(jnp.int32).reshape(1, width)

        lane_spec = _row_spec(w)
        win_in = ctx.window
        win_spec = pl.BlockSpec((34, w), lambda b: (0, b),
                                memory_space=pltpu.VMEM)
        emit_sh = (s_cap, width)
        emit_spec = pl.BlockSpec((s_cap, w), lambda b: (0, b),
                                 memory_space=pltpu.VMEM)
        m_sh = (1, width)
        scratch = pltpu.VMEM((6, w), jnp.int32)

    args = (
        win_in,
        row(ctx.word_end), row(ctx.seg_base_bits), row(ctx.end_subseq),
        row(ctx.lane_word0),
        ctx.hv_packed, ctx.limits, ctx.dvsm, ctx.vsm0.reshape(1, -1),
        arrs.maxcode, arrs.vsm,
        row(sp), row(sc), row(sz), row(pos0), row(bound_full), row(active0),
    )
    in_specs = [
        win_spec,
        lane_spec, lane_spec, lane_spec, lane_spec,
        _full_spec(ctx.hv_packed.shape), _full_spec(ctx.limits.shape),
        _full_spec(ctx.dvsm.shape), _full_spec((1, ctx.vsm0.shape[0])),
        _full_spec(arrs.maxcode.shape), _full_spec(arrs.vsm.shape),
        lane_spec, lane_spec, lane_spec, lane_spec, lane_spec, lane_spec,
    ]
    out_shape = [
        jax.ShapeDtypeStruct(emit_sh, jnp.int32),
        jax.ShapeDtypeStruct(m_sh, jnp.int32),
    ]
    out_specs = [emit_spec, lane_spec]
    rec, m = pl.pallas_call(
        functools.partial(_emit_kernel, cfg, s_cap, two_d),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[scratch],
        # the (s_cap, block) emission buffer lives in VMEM per block
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*args)
    if two_d:
        return rec.reshape(s_cap, width), m.reshape(width)
    return rec, m[0]


def _write_kernel(cfg, window_ref, we_ref, sb_ref, es_ref, lw_ref, hv_ref,
                  lim_ref, dvsm_ref, vsm0_ref, mc_ref, vsm_ref, inv_ref,
                  p0_ref, c0_ref, z0_ref, pos0_ref, du0_ref, bound_ref,
                  a0_ref,
                  rec_out, p_out, c_out, z_out, pos_out, resid_out,
                  acc_ref, st_ref):
    from . import huffman as H

    ctx = _make_ctx_ns(cfg, window_ref[:], we_ref[0], sb_ref[0], es_ref[0],
                       lw_ref[0], hv_ref[:], lim_ref[:], dvsm_ref[:],
                       vsm0_ref[0])
    arrs = SimpleNamespace(maxcode=mc_ref[:], vsm=vsm_ref[:])
    du0 = du0_ref[0]
    bound = bound_ref[0]
    active0 = (a0_ref[0] != 0) & (p0_ref[0] < ctx.end_subseq)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    # zig-zag index of each natural position (input: captured constant
    # arrays do not lower in Pallas)
    inv_nat_col = inv_ref[0][None, :, None]  # (1, 64, 1)
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (_WRITE_D, 1, 1), 0)

    # per-lane loop state in VMEM scratch; the while carry is one scalar
    # (Mosaic cannot legalize vector loop carries in these layouts)
    st_ref[0] = p0_ref[0]
    st_ref[1] = c0_ref[0]
    st_ref[2] = z0_ref[0]
    st_ref[3] = pos0_ref[0]
    st_ref[4] = active0.astype(jnp.int32)
    st_ref[5] = jnp.zeros_like(p0_ref[0])  # resid

    def body(_):
        p = st_ref[0]
        c = st_ref[1]
        z = st_ref[2]
        pos = st_ref[3]
        active = st_ref[4] != 0
        resid = st_ref[5] != 0
        for _u in range(min(H._resolve_unroll(cfg), _WRITE_UNROLL)):
            alive = active & (pos < bound)
            data = H._load32(ctx, p)
            length, sym, run = H._decode_symbol(cfg, arrs, ctx, data, c, z)
            crosses = p + length > ctx.end_subseq
            wp = pos + run
            writes = (sym != 0) & (wp < bound)
            d_loc = (wp >> 6) - du0
            overflow = writes & (d_loc >= _WRITE_D)
            commit = alive & ~crosses & ~overflow
            resid = resid | (alive & ~crosses & overflow)
            # state update (identical to ops.huffman._symbol_step)
            p = jnp.where(commit, p + length, p)
            z_new = z + run + 1
            wrap = z_new >= 64
            c_new = jnp.where(wrap, c + 1, c)
            c_new = jnp.where(c_new >= cfg.du_per_mcu, 0, c_new)
            z = jnp.where(commit, jnp.where(wrap, 0, z_new), z)
            c = jnp.where(commit, c_new, c)
            pos = jnp.where(commit, wp + 1, pos)
            # accumulate into the (D, 64) du window at (d_loc, natural(iz))
            do_write = commit & writes
            iz = wp & 63
            oh = ((d_loc[None, None, :] == iota_d)
                  & (iz[None, None, :] == inv_nat_col)
                  & do_write[None, None, :])
            acc_ref[:] = acc_ref[:] + jnp.where(oh, sym[None, None, :], 0)
            active = commit
        st_ref[0] = p
        st_ref[1] = c
        st_ref[2] = z
        st_ref[3] = pos
        st_ref[4] = active.astype(jnp.int32)
        st_ref[5] = resid.astype(jnp.int32)
        return jnp.any(active)

    jax.lax.while_loop(lambda go: go, body, jnp.any(active0))
    rec_out[:] = acc_ref[:].astype(jnp.int16)
    p_out[0] = st_ref[0]
    c_out[0] = st_ref[1]
    z_out[0] = st_ref[2]
    pos_out[0] = st_ref[3]
    resid_out[0] = st_ref[5]


def decode_write_fused(cfg, arrs, ctx, p, c, z, n_off, pos_base=None,
                       bound=None, total_out=None, entry=None):
    """Fused writing decode: VMEM du-window accumulation + windowed scatter.

    Drop-in for ops.huffman.decode_write on TPU. Returns
    int16[total_positions] stream-order coefficients.
    """
    from . import huffman as H

    lanes = cfg.lanes
    total = cfg.total_positions if total_out is None else total_out
    seg = arrs.seg_of_subseq
    seg_pos_base = seg * cfg.positions_per_seg if pos_base is None else pos_base
    if bound is None:
        bound_full = jnp.minimum((seg + 1) * cfg.positions_per_seg, total)
    else:
        bound_full = bound

    sp, sc, sz = H.write_start_states(ctx, p, c, z, entry)
    pos0 = seg_pos_base + n_off
    du0 = pos0 >> 6
    active0 = ctx.lane_valid & (pos0 < bound_full)

    width = lanes
    w = _block(width, _WRITE_BLOCK)
    grid = (width // w,)

    def row(x):
        return x.astype(jnp.int32).reshape(1, width)

    inv_nat = jnp.asarray(
        np.argsort(np.asarray(C.ORDER_NATURAL)).astype(np.int32)).reshape(
            1, 64)
    args = (
        ctx.window,
        row(ctx.word_end), row(ctx.seg_base_bits), row(ctx.end_subseq),
        row(ctx.lane_word0),
        ctx.hv_packed, ctx.limits, ctx.dvsm, ctx.vsm0.reshape(1, -1),
        arrs.maxcode, arrs.vsm, inv_nat,
        row(sp), row(sc), row(sz), row(pos0), row(du0), row(bound_full),
        row(active0),
    )
    in_specs = [
        pl.BlockSpec((34, w), lambda b: (0, b), memory_space=pltpu.VMEM),
        _row_spec(w), _row_spec(w), _row_spec(w), _row_spec(w),
        _full_spec(ctx.hv_packed.shape), _full_spec(ctx.limits.shape),
        _full_spec(ctx.dvsm.shape), _full_spec((1, ctx.vsm0.shape[0])),
        _full_spec(arrs.maxcode.shape), _full_spec(arrs.vsm.shape),
        _full_spec((1, 64)),
        _row_spec(w), _row_spec(w), _row_spec(w), _row_spec(w), _row_spec(w),
        _row_spec(w), _row_spec(w),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((_WRITE_D, 64, width), jnp.int16),
        jax.ShapeDtypeStruct((1, width), jnp.int32),
        jax.ShapeDtypeStruct((1, width), jnp.int32),
        jax.ShapeDtypeStruct((1, width), jnp.int32),
        jax.ShapeDtypeStruct((1, width), jnp.int32),
        jax.ShapeDtypeStruct((1, width), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((_WRITE_D, 64, w), lambda b: (0, 0, b),
                     memory_space=pltpu.VMEM),
        _row_spec(w), _row_spec(w), _row_spec(w), _row_spec(w), _row_spec(w),
    ]
    records, pe, ce, ze, pose, resid = pl.pallas_call(
        functools.partial(_write_kernel, cfg),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((_WRITE_D, 64, w), jnp.int32),
                        pltpu.VMEM((6, w), jnp.int32)],
        interpret=_interpret(),
    )(*args)

    # place the (D, 64) windows: ONE scatter index per lane
    assert total % C.DATA_UNIT_SIZE == 0
    n_du = total // C.DATA_UNIT_SIZE
    updates = jnp.transpose(records, (2, 0, 1))  # (lanes, D, 64)
    du0_c = jnp.where(active0, du0, n_du)  # inactive lanes: zero pad rows
    out2d = jnp.zeros((n_du + _WRITE_D, C.DATA_UNIT_SIZE), jnp.int16)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,))
    out2d = jax.lax.scatter_add(
        out2d, du0_c[:, None], updates, dnums,
        indices_are_sorted=False, unique_indices=False,
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP)
    out_flat = out2d.reshape(-1)  # padding rows double as the drop slot

    # lanes whose subsequence spans > D data units resume on narrow rounds
    out_flat = H.scatter_finish(cfg, arrs, ctx, pe[0], ce[0], ze[0], pose[0],
                                (resid[0] != 0) & (pose[0] < bound_full),
                                bound_full, out_flat, total)
    return out_flat[:total]
