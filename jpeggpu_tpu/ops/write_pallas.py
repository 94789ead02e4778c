"""Tile-assembly coefficient write path: MXU one-hot placement, no scatter.

XLA:TPU scatter costs ~7-10 ns per index at *element* granularity even for
windowed row updates (scripts/scatterbench.py), which put the reference-shape
write stage (decode_huffman.cu:627-682 scatters from shared memory — a GPU
shape with no TPU analog) at ~60 ms for a 12 MP image. This module rebuilds
coefficient materialization so the hot path never scatters:

1. *Records* come from the dense-emission decode
   (ops/huffman.py decode_write_emit): value and stream position of each
   committed symbol at ``(slot, lane)`` — writes at loop-counter positions.
2. :func:`tiles_from_records` (Pallas): each lane's records become a
   ``(D, 64)`` *tile* — row ``d`` holds data unit ``du0[lane] + d`` in
   zig-zag order — via batched one-hot ``dot_general`` contractions over
   128-slot rounds. The one-hot expansion that drowned the VPU (~2048x
   wasted lanes/symbol) runs on the MXU, where it is ~100x cheaper; every
   output cell receives at most one term (positions are unique), so f32
   accumulation is exact.
3. :func:`expand_tiles` (Pallas): output rows are produced in dense
   128-data-unit blocks. Each block multi-hot-gathers matching tile rows
   (``du0[lane] + d == row``) from a 64-lane slab selected by a
   scalar-prefetched BlockSpec index map — a plain 2D matmul; rows shared
   by two lanes (a subsequence ending mid-data-unit) sum naturally.
4. Lanes whose tile window or lane slab overflows (low-entropy spans > D
   data units; pathological streams piling >64 lanes into 128 data units)
   are *leftover*: excluded from tiles and finished by a compacted
   element scatter loop (:func:`scatter_leftover`) — correct for any
   input, never taken on typical photographic content.

Zig-zag -> natural coefficient order is folded into the stage-1 one-hot
compare (the 64-column one-hot tests against a permuted constant instead of
an iota), so tiles and supertiles are natural-order from birth and the
expand kernels are pure gather-sums.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C

# default tile rows per lane: covers subsequences spanning < tile_d data
# units; the pipeline picks a per-plan tile_d (ScanConfig.tile_d) from the
# stream's average data-units-per-subsequence
_TILE_D = 96
# record slots contracted per MXU round
_ROUND_R = 128
# lanes per tiles-kernel block
_TILE_BLOCK = 64
# output data units per expand-kernel block (the slab window is 2 aligned
# 32-lane blocks = 64 candidate lanes)
_GROUP_DU = 128
_SLAB = 32
# compacted width of one leftover-scatter round
# the scatter costs ~8 ns per static element per round, so rounds are
# narrow: typical content leaves a handful of leftover lanes, and the
# while-loop takes more rounds only when content is pathological.
# Profiled 2026-08-20: one 64-lane round costs ~0.6 ms (mostly fixed
# fusion cost); shrinking K to 8 made the round's nonzero compaction
# lower pathologically (+4 ms) — do NOT narrow this below 64
_LEFTOVER_K = 64
# supertile geometry (tile_mode="super"): rows per supertile and supertiles
# per stage-1 kernel block
_SUPER_D = 128
_SUPER_SB = 8
# columns of the expand kernel's narrow DC side output (column 0 is the DC
# slot; 8 int16 columns keep the minor dim a whole 16-byte sublane)
_DC_COLS = 8


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _tiles_kernel(s_cap, tile_d, dot_dtype, val_ref, wpos_ref, m_ref,
                  du0_ref, inc_ref, iota_d_ref, iota_z_ref, tiles_out,
                  acc_ref):
    # val_ref/wpos_ref are lane-major (wl, s_cap): the slot axis is the
    # Mosaic minor dimension (multiple of 128); per-lane scalars ride as
    # (wl, 1) columns
    inc = inc_ref[:, 0] != 0
    m = jnp.where(inc, m_ref[:, 0], 0)
    mmax = jnp.max(m)
    du0 = du0_ref[:, 0]
    # the narrow iotas ride in as inputs: Mosaic rejects non-i32 iota, and
    # casting an i32 iota in-kernel would relayout the whole 3D operand
    iota_d = iota_d_ref[0][None, None, :]  # (1, 1, tile_d)
    iota_z = iota_z_ref[0][None, None, :]  # (1, 1, 64)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, _ROUND_R, 1), 1)
    dn = (((1,), (1,)), ((0,), (0,)))

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def round_body(state):
        r = state
        v = val_ref[:, pl.ds(r * _ROUND_R, _ROUND_R)].astype(jnp.int32)
        w = wpos_ref[:, pl.ds(r * _ROUND_R, _ROUND_R)]
        slot = r * _ROUND_R + iota_s  # (1, s, 1)
        valid = ((slot < m[:, None, None]) & (w[:, :, None] >= 0)
                 & inc[:, None, None])
        d_rel = (w >> 6) - du0[:, None]
        iz = w & 63
        if dot_dtype == "f32":
            valid = valid & (d_rel[:, :, None] >= 0) \
                & (d_rel[:, :, None] < tile_d)
            # batched one-hot contraction on the MXU: (l, s, D) x (l, s, 64)
            # -> (l, D, 64); at most one slot hits a given (l, d, z), so f32
            # is exact (|val| < 2^15 << 2^24)
            a = jnp.where((d_rel[:, :, None] == iota_d) & valid, 1.0, 0.0)
            b = jnp.where(iz[:, :, None] == iota_z,
                          v[:, :, None].astype(jnp.float32), 0.0)
            acc_ref[:] += jax.lax.dot_general(
                a, b, dn, preferred_element_type=jnp.float32)
            return r + 1
        # narrow-native modes: fold validity into d_rel (-1 never matches
        # the iota) so the 3D compare/select operands are built directly in
        # the narrow dtype — only 2D (wl, R) casts happen. Valid d_rel is in
        # [0, tile_d) with tile_d <= 128, exact in int8 (after int32->int8
        # wrap 128..255 would alias, but those rows are already -1) and in
        # bf16's 8-bit significand.
        narrow = jnp.bfloat16 if dot_dtype == "bf16" else jnp.int8
        d_eff = jnp.where(valid[:, :, 0] & (d_rel >= 0) & (d_rel < tile_d),
                          d_rel, -1).astype(narrow)
        zq = iz.astype(narrow)
        one = jnp.ones((), narrow)
        zero = jnp.zeros((), narrow)
        a = jnp.where(d_eff[:, :, None] == iota_d, one, zero)
        bz = zq[:, :, None] == iota_z
        # split the value into byte planes: lo in [0, 255] (int8 arrives
        # signed-wrapped and is unwrapped after the dot; bf16 holds it
        # exactly), hi = arithmetic v >> 8 in [-128, 127]
        vlo = (v & 0xFF).astype(narrow)
        vhi = (v >> 8).astype(narrow)
        blo = jnp.where(bz, vlo[:, :, None], zero)
        bhi = jnp.where(bz, vhi[:, :, None], zero)
        if dot_dtype == "bf16":
            tl = jax.lax.dot_general(a, blo, dn,
                                     preferred_element_type=jnp.float32)
            th = jax.lax.dot_general(a, bhi, dn,
                                     preferred_element_type=jnp.float32)
            acc_ref[:] += (th * 256.0 + tl).astype(jnp.int16)
        else:
            tl = jax.lax.dot_general(a, blo, dn,
                                     preferred_element_type=jnp.int32)
            th = jax.lax.dot_general(a, bhi, dn,
                                     preferred_element_type=jnp.int32)
            acc_ref[:] += ((th << 8) + (tl & 0xFF)).astype(jnp.int16)
        return r + 1

    jax.lax.while_loop(lambda r: r * _ROUND_R < mmax, round_body,
                       jnp.int32(0))
    out = acc_ref[:]
    tiles_out[:] = out if out.dtype == jnp.int16 else out.astype(jnp.int16)


def resolve_tile_dot(mode: str) -> str:
    """Tuning.tile_dot -> concrete dot dtype ("auto" -> measured best).

    f32 wins by default: on v5e (2026-08-18) Mosaic fails to lower the
    *batched* narrow dot_general forms below (bf16/int8 both; the batched
    f32 dot and unbatched narrow dots compile), so the narrow byte-plane
    modes are exercised only on interpret/CPU backends by the tests.
    """
    return "f32" if mode == "auto" else mode


def tiles_from_records(val, wpos, m, du0, include, tile_d: int = _TILE_D,
                       tile_dot: str = "f32"):
    """Records -> per-lane (D, 64) zig-zag data-unit tiles.

    ``include`` masks leftover lanes to zero tiles. Returns
    int16[lanes, tile_d, 64].
    """
    s_cap, lanes = val.shape
    if s_cap % _ROUND_R:  # pad to whole MXU rounds; padding slots are inert
        pad = _ROUND_R - s_cap % _ROUND_R
        val = jnp.pad(val, ((0, pad), (0, 0)))
        wpos = jnp.pad(wpos, ((0, pad), (0, 0)), constant_values=-1)
        s_cap += pad
    wl = min(_TILE_BLOCK, lanes)
    grid = (lanes // wl,)

    def col(x):
        return x.astype(jnp.int32).reshape(lanes, 1)

    dot_dtype = resolve_tile_dot(tile_dot)
    iota_dt = {"f32": jnp.float32, "bf16": jnp.bfloat16,
               "int8": jnp.int8}[dot_dtype]
    iota_d_in = jnp.arange(tile_d, dtype=jnp.int32).astype(
        iota_dt).reshape(1, tile_d)
    # natural-order fold: column j holds the coefficient whose zig-zag
    # index is invz[j], so tiles come out natural-order and the expand
    # kernel needs no 64x64 permutation matmul (values 0..63 are exact in
    # every dot dtype; -1-masked rows never match)
    iota_z_in = jnp.asarray(
        np.argsort(np.asarray(C.ORDER_NATURAL)).astype(np.int32)).astype(
        iota_dt).reshape(1, 64)
    acc_dt = jnp.float32 if dot_dtype == "f32" else jnp.int16

    col_spec = pl.BlockSpec((wl, 1), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
    rec_spec = pl.BlockSpec((wl, s_cap), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
    tiles = pl.pallas_call(
        functools.partial(_tiles_kernel, s_cap, tile_d, dot_dtype),
        grid=grid,
        in_specs=[rec_spec, rec_spec, col_spec, col_spec, col_spec,
                  pl.BlockSpec((1, tile_d), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 64), lambda b: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((wl, tile_d, 64), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lanes, tile_d, 64), jnp.int16),
        scratch_shapes=[pltpu.VMEM((wl, tile_d, 64), acc_dt)],
        # the per-block working set (records + one-hot operands + the
        # accumulator, double-buffered) exceeds Mosaic's default 16 MiB
        # scoped-vmem budget; v5e cores carry 128 MiB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(val.T, wpos.T, col(m), col(du0), col(include), iota_d_in, iota_z_in)
    return tiles


# --- supertile path (tile_mode="super") -------------------------------------
#
# The per-lane tiles above lower to one small batched dot per lane per round
# (~49K sequential MXU ops on a 12 MP image, 13.7 ms measured on v5e
# 2026-08-19). Supertiles remove the batch dimension: super_g consecutive
# lanes share one (_SUPER_D, 64) data-unit window anchored at the group's
# first lane, and a whole round of G*128 record slots contracts in ONE
# unbatched dot pair. Records are pre-interleaved in XLA to (n_st, s_cap*G)
# rows (column = slot*G + g) because Mosaic cannot merge a (G, 128) vector
# into a (G*128,) minor dimension in-kernel; with row-shaped chunks both
# one-hot operands build as plain broadcasts:
#     a_t[d, k] = (d_rel[k] == d)            (_SUPER_D, K)
#     b_t[z, k] = (iz[k] == z) * value[k]    (64, K)
#     tile    += a_t . b_t^T                 contract minor axes
# The dots run as byte-plane bf16 pairs: Mosaic executes this minor-axis
# f32 contraction at default (bf16) MXU precision, which rounds 16-bit
# coefficients (observed +-1/+-2 errors on v5e); one-hot entries and byte
# planes are 8-bit and therefore exact in bf16, and every output cell
# receives at most one record, so lo/hi reconstruction is exact.
# Measured (scripts/supertile_proto.py, v5e 2026-08-19): 3.71 ms vs 13.67
# for the per-lane path; f32 Precision.HIGHEST is exact too but 7.47 ms.


def _supertiles_kernel(s_cap, G, dot, planes, round_r, super_d, val_ref,
                       pk_ref, m_ref, invz_ref, out_ref, acc_ref):
    K = G * round_r
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (super_d, 1), 0)
    # natural-order fold: row j of the tile holds the coefficient whose
    # zig-zag index is invz[j] (= the zig-zag index stored at natural
    # position j), so the zig-zag -> natural reorder that used to be a
    # 64x64 permutation matmul in the expand kernel costs nothing here —
    # the one-hot compare runs against a permuted constant instead of an
    # iota. Leftover lanes already scatter natural-order positions.
    iota_z = invz_ref[:]  # (64, 1) int32
    for st in range(_SUPER_SB):
        mmax = jnp.max(m_ref[st])
        acc_ref[:] = jnp.zeros_like(acc_ref)

        def round_body(r):
            p = pk_ref[st, pl.ds(r * K, K)][None, :].astype(jnp.int32)
            v32 = val_ref[st, pl.ds(r * K, K)][None, :].astype(jnp.int32)
            dd = jnp.where(p >= 0, p >> 6, -1)
            zz = jnp.where(p >= 0, p & 63, -1)
            bz = zz == iota_z
            dnn = (((1,), (1,)), ((), ()))
            # two half-width dots per round, NOT one fused (128, K) x
            # (128, K) -> (128, 128) contraction: the fused form was
            # measured 2.4x slower on v5e (2026-08-20 r5 decomposition —
            # stage1 4.6 ms vs 1.9; the concat + wider accumulator lose
            # more than the second dot issue costs)
            if dot == "int8":
                # int8 byte planes: exact like bf16 (one record per cell);
                # lo arrives signed-wrapped and is unwrapped after the dot
                a_t = jnp.where(dd == iota_d, 1, 0).astype(jnp.int8)
                blo = jnp.where(bz, v32 & 255, 0).astype(jnp.int8)
                bhi = jnp.where(bz, v32 >> 8, 0).astype(jnp.int8)
                tl = jax.lax.dot_general(a_t, blo, dnn,
                                         preferred_element_type=jnp.int32)
                th = jax.lax.dot_general(a_t, bhi, dnn,
                                         preferred_element_type=jnp.int32)
                acc_ref[:] += ((th << 8) + (tl & 255)).astype(jnp.float32)
            else:
                a_t = jnp.where(dd == iota_d, 1.0, 0.0).astype(jnp.bfloat16)
                blo = jnp.where(bz, (v32 & 255).astype(jnp.float32),
                                0.0).astype(jnp.bfloat16)
                bhi = jnp.where(bz, (v32 >> 8).astype(jnp.float32),
                                0.0).astype(jnp.bfloat16)
                tl = jax.lax.dot_general(a_t, blo, dnn,
                                         preferred_element_type=jnp.float32)
                th = jax.lax.dot_general(a_t, bhi, dnn,
                                         preferred_element_type=jnp.float32)
                acc_ref[:] += th * 256.0 + tl
            return r + 1

        jax.lax.while_loop(lambda r: r * round_r < mmax, round_body,
                           jnp.int32(0))
        t16 = acc_ref[:].astype(jnp.int16)
        if planes:
            # expand-ready signed-int8 split (see _expand_super_kernel):
            # columns [0,64) hi = t >> 8, [64,128) b0 = (t & 255) - 128
            t32 = t16.astype(jnp.int32)
            p_hi = (t32 >> 8).astype(jnp.int8)
            p_b0 = ((t32 & 255) - 128).astype(jnp.int8)
            out_ref[st] = jnp.concatenate([p_hi, p_b0], axis=1)
        else:
            out_ref[st] = t16


def supertiles_from_records(val_rows, pk_rows, mmax_st, G: int,
                            dot: str = "bf16", planes: bool = False,
                            round_r: int = _ROUND_R,
                            super_d: int = _SUPER_D):
    """Interleaved records -> (n_st, _SUPER_D, 64) *natural-order* supertiles.

    ``val_rows``/``pk_rows`` are int16[n_st, s_cap*G] with column s*G + g;
    ``pk`` packs (d_rel << 6) | iz, -1 on inert slots. ``mmax_st`` is
    int32[n_st, 1], the max slot count over the group's included lanes.

    With ``planes`` the output is int8[n_st, _SUPER_D, 128]: the signed
    hi/b0 byte-plane split the int8 expand kernel consumes directly —
    built once here instead of per expand grid step.
    """
    n_st, sg = val_rows.shape
    s_cap = sg // G
    assert s_cap % round_r == 0, (s_cap, round_r)
    assert n_st % _SUPER_SB == 0
    invz = jnp.asarray(
        np.argsort(np.asarray(C.ORDER_NATURAL)).astype(np.int32).reshape(
            64, 1))
    rec_spec = pl.BlockSpec((_SUPER_SB, sg), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
    out_cols = 128 if planes else 64
    out_dt = jnp.int8 if planes else jnp.int16
    return pl.pallas_call(
        functools.partial(_supertiles_kernel, s_cap, G, dot, planes,
                          round_r, super_d),
        grid=(n_st // _SUPER_SB,),
        in_specs=[rec_spec, rec_spec,
                  pl.BlockSpec((_SUPER_SB, 1), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((64, 1), lambda b: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_SUPER_SB, super_d, out_cols),
                               lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_st, super_d, out_cols), out_dt),
        scratch_shapes=[pltpu.VMEM((super_d, 64), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(val_rows, pk_rows, mmax_st, invz)


def tiles_to_planes(stiles):
    """int16 supertiles -> the signed hi/b0 byte-plane form the int8
    expand kernel consumes (int8[n_st, _SUPER_D, 128]; columns [0,64) hi =
    t >> 8, [64,128) b0 = (t & 255) - 128). Stage 1 emits this form
    directly (``planes=True``); this helper exists for tests and callers
    holding plain tiles."""
    t32 = jnp.asarray(stiles).astype(jnp.int32)
    return jnp.concatenate([(t32 >> 8).astype(jnp.int8),
                            ((t32 & 255) - 128).astype(jnp.int8)], axis=2)


def _expand_super_kernel(W, dot, group_du, q_ref, *refs):
    cand_refs = refs[:W]
    tile_refs = refs[W:2 * W]
    out_ref = refs[2 * W]
    dc_ref = refs[2 * W + 1]
    g = pl.program_id(0)
    j = g * group_du + jax.lax.broadcasted_iota(
        jnp.int32, (group_du, 1), 0)
    # ONE concatenated dot instead of W small dots: Mosaic issues each dot
    # as its own MXU op sequence, so W separate dots pay W pipeline fills
    # per grid step where the fused (group_du, W*128) x (W*128, cols)
    # contraction pays one (same flops).
    cand = jnp.concatenate([r[:] for r in cand_refs], axis=1)
    hit = cand == j  # (group_du, W*_SUPER_D)
    if dot == "int8":
        # 2-plane signed-int8 split, exact under MULTI-record sums (unlike
        # the lo/hi byte planes of stage 1's RECORD dots, which rely on one
        # record per cell): t = 256*hi + (b0 + 128) with hi = t >> 8
        # (arithmetic) and b0 = (t & 255) - 128, both in [-128, 127].
        # Summing k records gives sum(t) = 256*dot_hi + dot_b0 + 128*k,
        # and k per output ROW is the row-sum of the one-hot (every
        # selected tile row feeds all 64 columns), a cheap VPU reduce.
        # The planes arrive pre-split from stage 1 as one (128, 128) int8
        # block per supertile (columns [0,64) hi, [64,128) b0), so the
        # whole gather-sum is ONE full-MXU-width int8 dot — no per-step
        # int16 -> int8 conversion and no second half-width dot.
        sel = hit.astype(jnp.int8)
        planes = jnp.concatenate([r[:] for r in tile_refs], axis=0)
        d2 = jax.lax.dot(sel, planes, preferred_element_type=jnp.int32)
        cnt = jnp.sum(hit.astype(jnp.int32), axis=1, keepdims=True)
        acc16 = ((d2[:, :64] << 8) + d2[:, 64:] + (cnt << 7)).astype(
            jnp.int16)
        out_ref[:] = acc16
        # DC side output: the first _DC_COLS natural-order columns (column
        # 0 is the DC slot). Consumers read only column 0; the narrow
        # block spares the DC stage a strided re-read of the full 37 MB
        # coefficient stream (profiled at ~1.2 ms on the 12 MP bench).
        dc_ref[:] = acc16[:, :_DC_COLS]
        return
    sel = jnp.where(hit, 1.0, 0.0)
    tiles = jnp.concatenate([r[:] for r in tile_refs], axis=0)
    acc = jax.lax.dot(sel, tiles.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
    acc16 = acc.astype(jnp.int16)
    out_ref[:] = acc16
    dc_ref[:] = acc16[:, :_DC_COLS]


def expand_supertiles(stiles, base, q, n_groups: int, W: int,
                      dot: str = "f32", group_du: int = _GROUP_DU):
    """Supertiles -> dense (n_groups * group_du, 64) natural-order rows.

    Output group ``g`` (``group_du`` data units) gathers the rows of
    supertiles ``q[g] .. q[g]+W-1`` whose data unit ``base[st] + d`` falls
    in the group; rows shared by two lanes in different supertiles sum
    here. Supertiles arrive already natural-order within each data unit
    (stage 1 folds the zig-zag permutation into its one-hot compare).
    In int8 mode ``stiles`` is the stage-1 byte-plane output
    (int8[n_st, 128, 128]); in f32 mode the int16 tiles.

    Returns ``(rows, dc_cols)``: the dense rows plus a narrow
    (n_groups * group_du, _DC_COLS) side output whose column 0 is each
    data unit's (still difference-coded) DC coefficient — the DC stage
    reads this instead of striding over the full coefficient stream."""
    n_st, super_d, t_cols = stiles.shape
    stiles2d = stiles.reshape(n_st * super_d, t_cols)
    cand2d = (base[:, None]
              + jnp.arange(super_d, dtype=jnp.int32)[None, :]).reshape(
                  1, n_st * super_d)

    def cand_spec(k):
        return pl.BlockSpec((1, super_d), lambda g, q, k=k: (0, q[g] + k),
                            memory_space=pltpu.VMEM)

    def tile_spec(k):
        return pl.BlockSpec((super_d, t_cols),
                            lambda g, q, k=k: (q[g] + k, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups,),
        in_specs=[cand_spec(k) for k in range(W)]
        + [tile_spec(k) for k in range(W)],
        out_specs=[pl.BlockSpec((group_du, 64), lambda g, q: (g, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((group_du, _DC_COLS),
                                lambda g, q: (g, 0),
                                memory_space=pltpu.VMEM)],
    )
    return pl.pallas_call(
        functools.partial(_expand_super_kernel, W, dot, group_du),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_groups * group_du, 64),
                                        jnp.int16),
                   jax.ShapeDtypeStruct((n_groups * group_du, _DC_COLS),
                                        jnp.int16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(q, *([cand2d] * W), *([stiles2d] * W))


def _super_slab(base, max_du, include, G: int, n_groups: int, W: int,
                group_du: int = _GROUP_DU):
    """q[g]: first supertile of output group g's W-wide gather window,
    anchored at the first supertile whose included lanes reach the group
    (mirrors _slab_index at supertile granularity)."""
    n_st = base.shape[0]
    reach = jnp.where(include, max_du, -1)
    reach_st = jax.lax.cummax(jnp.max(reach.reshape(n_st, G), axis=1))
    thresholds = jnp.arange(n_groups, dtype=jnp.int32) * group_du
    q = jnp.searchsorted(reach_st, thresholds, side="left").astype(jnp.int32)
    return jnp.clip(q, 0, max(n_st - W, 0))


def resolve_expand_dot(mode: str) -> str:
    """Tuning.expand_dot -> expand-kernel dot dtype. "auto" selects the
    plain f32 dot: exact (standard-form 2D dots lower to the multi-pass
    HIGHEST-precision path), and measured fastest at group_du=256 on v5e
    (2026-08-20 r5: 6.10 ms assembly vs 6.50 for the signed-int8
    2-plane split — f32 needs no per-row one-hot count reduce and no
    stage-1 plane conversion; at the old group_du=128 int8 had won,
    5.89 vs 6.93 bf16). "int8" keeps the 2-plane split (exact for any
    per-cell record count, see _expand_super_kernel; single-pass MXU).
    "bf16" (the retired byte-plane pair) maps to int8."""
    return "int8" if mode in ("int8", "bf16") else "f32"


def resolve_super_dot(mode: str) -> str:
    """Tuning.tile_dot -> supertile stage-1 dot dtype. "auto" selects the
    int8 byte-plane pair: exact (one record per cell; lo unwrapped after
    the dot) and measured fastest on v5e (2026-08-20 sweep: 5.89 ms vs
    6.93 bf16 at s_trim=256 on the 12 MP assembly). "f32" maps to bf16
    byte planes — a plain f32 dot in this 2D form runs at DEFAULT bf16
    precision on v5e and rounds 16-bit coefficients (BENCH.md §6), so the
    byte-plane split is load-bearing, not a dtype choice."""
    return "bf16" if mode in ("bf16", "f32") else "int8"


def assemble_supertiles(rec, m, du0_raw, pos0, total: int, G: int, W: int,
                        s_trim: int = 512, dot: str = "bf16",
                        expand_dot: str = "auto", return_dc: bool = False,
                        pos_offset: int = 0, group_du: int = _GROUP_DU,
                        super_d: int = _SUPER_D,
                        _upto: str | None = None):
    """Supertile record assembly: stage1 + expand + leftover + reorder.

    ``_upto`` ("prep" | "stage1") truncates the computation for the
    stage-timing probes (scripts/stagebench.py --slope2) — not part of
    the public contract.

    ``rec`` is the packed emission (ops/huffman.pack_record: value and
    LANE-LOCAL position in one int32) and ``pos0`` each lane's first
    global output position; unpacking happens after the static slot trim,
    so the full-depth buffer is read once at half the width of the old
    separate value/position arrays. Same output contract as
    :func:`assemble_tiles`: int16[total] stream-order coefficients,
    natural order within each data unit. With ``return_dc`` also returns
    an int16[>= total//64] vector of per-data-unit difference-coded DC
    values (the expand kernel's narrow side output, leftover-corrected)
    for the DC stage.

    ``pos_offset`` (a multiple of 64) rebases global record positions to
    this call's [0, total) range — merged-lane batches slice their emit
    buffers per image and assemble each image at single-image shapes
    (parallel/batch.py), passing the image's position base here;
    ``du0_raw`` must already be rebased by the caller.

    ``s_trim`` statically trims the record slot axis before the interleave
    and stage-1 contraction: the emit buffer is sized for the 1-bit-code
    worst case (~1280 slots, ops/huffman._emit_cap) but real content fills
    ~250 (BENCH.md mdist), so the prep/interleave would move 2.5-5x dead
    slots. Lanes whose slot count exceeds the trim drain through the
    leftover scatter with their full record lists — exactness does not
    depend on the trim."""
    from .huffman import unpack_record

    s_cap, lanes = rec.shape
    assert total % C.DATA_UNIT_SIZE == 0
    assert lanes % G == 0
    assert 0 < super_d <= 512  # pk packs d_rel << 6 | iz into int16
    n_st = lanes // G
    # the expand kernel gathers supertile blocks q[g] .. q[g]+W-1 and
    # _super_slab clips q to n_st - W: with fewer supertiles than the
    # window (small dense images) the unclamped window would read past the
    # last supertile, which Pallas clamps to re-fetching it — its rows
    # would sum into every group more than once
    W = min(W, n_st)
    n_du = total // C.DATA_UNIT_SIZE
    n_groups = -(-(n_du + 2) // group_du)

    S = min(s_trim, s_cap)
    assert S % _ROUND_R == 0, S  # stage-1 round reads must not overrun
    val_t, wl_t = unpack_record(rec[:S])
    wpos_t = wl_t + pos0[None, :]  # global position (valid slots only)
    over_trim = m > S

    du0 = jax.lax.cummax(du0_raw)
    unsorted = du0 != du0_raw
    base = du0.reshape(n_st, G)[:, 0]
    base_l = jnp.broadcast_to(base[:, None], (n_st, G)).reshape(lanes)
    st_l = jnp.arange(lanes, dtype=jnp.int32) // G

    slot = jnp.arange(S, dtype=jnp.int32)[:, None]
    valid = (slot < m[None, :]) & (wl_t >= 0)
    assert pos_offset % C.DATA_UNIT_SIZE == 0
    du = (wpos_t >> 6) - pos_offset // C.DATA_UNIT_SIZE
    max_du = jnp.max(jnp.where(valid, du, -1), axis=0)
    span_over = (max_du - base_l) >= super_d
    inc1 = ~(span_over | unsorted | over_trim) & (m > 0)
    q1 = _super_slab(base, max_du, inc1, G, n_groups, W, group_du)
    g_first = jnp.clip(du0 // group_du, 0, n_groups - 1)
    window_over = (st_l - q1[g_first]) >= W
    leftover = (span_over | unsorted | window_over | over_trim) & (m > 0)
    include = ~leftover & (m > 0)
    # final q can only move windows upward; every lane that passed the q1
    # check still fits (st - q shrinks) and q[g] <= st holds for every
    # included lane touching g by the reach construction
    q = _super_slab(base, max_du, include, G, n_groups, W, group_du)

    d_rel = du - base_l[None, :]
    ok = (valid & include[None, :] & (d_rel >= 0) & (d_rel < super_d))
    pk = jnp.where(ok, (d_rel << 6) | (wpos_t & 63), -1).astype(jnp.int16)

    def rows(x):
        return x.reshape(S, n_st, G).transpose(1, 0, 2).reshape(
            n_st, S * G)

    mmax_st = jnp.max(jnp.where(include, m, 0).reshape(n_st, G),
                      axis=1).astype(jnp.int32).reshape(n_st, 1)
    edot = resolve_expand_dot(expand_dot)
    vr, pr = rows(val_t.astype(jnp.int16)), rows(pk)
    if _upto == "prep":
        return (vr[:1, :1] + pr[:1, :1]).reshape(-1).astype(jnp.int16)
    # widest round that divides the trim (<= 256): at the tuned s_trim 256
    # the whole record list contracts in ONE 256-slot round — half the dot
    # issues and loop iterations of 128-slot rounds (v5e 2026-08-20 r5)
    round_r = 256 if S % 256 == 0 else _ROUND_R
    stiles = supertiles_from_records(vr, pr, mmax_st, G, dot=dot,
                                     planes=edot == "int8",
                                     round_r=round_r, super_d=super_d)
    if _upto == "stage1":
        return stiles[:1, :1, :1].reshape(-1).astype(jnp.int16)
    out2d, dc2d = expand_supertiles(stiles, base, q, n_groups, W,
                                    dot=edot, group_du=group_du)

    out_flat = out2d.reshape(-1)
    if return_dc:
        dc_flat = dc2d[:, 0]
        out_flat, dc_flat = scatter_leftover(out_flat, rec, m, pos0,
                                             leftover, total, s_trim=s_trim,
                                             dc_flat=dc_flat,
                                             pos_offset=pos_offset)
        return out_flat[:total], dc_flat
    out_flat = scatter_leftover(out_flat, rec, m, pos0, leftover,
                                total, s_trim=s_trim,
                                pos_offset=pos_offset)
    return out_flat[:total]


def _expand_kernel(q_ref, cand_a_ref, cand_b_ref, tile_a_ref, tile_b_ref,
                   out_ref):
    g = pl.program_id(0)
    j = g * _GROUP_DU + jax.lax.broadcasted_iota(jnp.int32,
                                                 (_GROUP_DU, 1), 0)
    # tiles are already natural-order within each data unit (stage 1
    # folds the zig-zag permutation into its one-hot compare)
    cand = jnp.concatenate([cand_a_ref[:], cand_b_ref[:]], axis=1)
    tiles = jnp.concatenate([tile_a_ref[:], tile_b_ref[:]], axis=0)
    sel = jnp.where(cand == j, 1.0, 0.0)  # (G, 2*SLAB*D)
    out_ref[:] = jax.lax.dot(
        sel, tiles.astype(jnp.float32),
        preferred_element_type=jnp.float32).astype(jnp.int16)


def expand_tiles(tiles, du0, q, n_groups):
    """Tiles -> dense (n_groups * _GROUP_DU, 64) *natural-order* rows.

    ``q[g]`` is the aligned slab index: output group ``g`` gathers from
    candidate lanes ``[32*q[g], 32*q[g] + 64)``. Row ``j`` sums tile rows
    with ``du0[lane] + d == j`` — shared boundary rows combine here.
    Tiles arrive natural-order within each data unit.
    """
    lanes, tile_d = tiles.shape[0], tiles.shape[1]
    tiles2d = tiles.reshape(lanes, tile_d * 64).reshape(
        lanes * tile_d, 64)
    # cand[l*D + d] = du0[l] + d, flattened to match tiles2d rows; rows of
    # excluded (zero-tile) lanes match harmlessly
    cand = (du0[:, None] + jnp.arange(tile_d, dtype=jnp.int32)[None, :])
    cand2d = cand.reshape(1, lanes * tile_d)

    kd = _SLAB * tile_d
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, kd), lambda g, q: (0, q[g]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kd), lambda g, q: (0, q[g] + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kd, 64), lambda g, q: (q[g], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kd, 64), lambda g, q: (q[g] + 1, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_GROUP_DU, 64), lambda g, q: (g, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _expand_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups * _GROUP_DU, 64),
                                       jnp.int16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(q, cand2d, cand2d, tiles2d, tiles2d)
    return out


def _lane_extents(wpos, m, du0, tile_d: int):
    """Per-lane record extent and tile-window overflow flag."""
    s_cap, lanes = wpos.shape
    slot = jnp.arange(s_cap, dtype=jnp.int32)[:, None]
    valid = (slot < m[None, :]) & (wpos >= 0)
    max_du = jnp.max(jnp.where(valid, wpos >> 6, -1), axis=0)
    span_over = (max_du - du0) >= tile_d
    return span_over, max_du


def _window_over(du0, q_of_group, lanes):
    """Lanes falling above their first group's 64-lane slab window (the
    first touched group is the worst case: q is nondecreasing along groups,
    and the below-window side is impossible because the running-max search
    anchors each group's slab at or before every lane that touches it)."""
    n_groups = q_of_group.shape[0]
    g_first = jnp.clip(du0 // _GROUP_DU, 0, n_groups - 1)
    lane = jnp.arange(lanes, dtype=jnp.int32)
    return (lane - _SLAB * q_of_group[g_first]) >= 2 * _SLAB


def _slab_index(du0, max_du, include, lanes, n_groups):
    """q[g]: aligned first-slab index of output group g, anchored at the
    first *included* lane whose span reaches the group (leftover lanes are
    excluded so one low-entropy lane cannot poison the window)."""
    reach = jnp.where(include, max_du, -1)
    reach = jax.lax.cummax(reach)
    thresholds = jnp.arange(n_groups, dtype=jnp.int32) * _GROUP_DU
    l0 = jnp.searchsorted(reach, thresholds, side="left").astype(jnp.int32)
    return jnp.clip(l0 // _SLAB, 0, max(lanes // _SLAB - 2, 0))


def scatter_leftover(out_flat, rec, m, pos0, leftover, total,
                     s_trim: int = 512, dc_flat=None,
                     pos_offset: int = 0):
    """Element-scatter the records of leftover lanes until none remain.

    XLA:TPU scatter costs ~8 ns per STATIC element regardless of masking
    (scripts/scatterbench.py), so the round geometry must stay proportional
    to real leftover work: rounds compact ``_LEFTOVER_K`` lanes and read
    only the first ``s_trim`` record slots (a handful of lanes x ~250
    real records on photographic content — one small round). Lanes whose
    record count exceeds the trim drain through a second full-depth tier.
    ``rec`` is the packed emission (ops/huffman.pack_record), unpacked
    only at the compacted round width; ``pos0`` rebases lane-local record
    positions to global ones.

    ``out_flat`` carries a drop slot at index ``total`` and is in *natural*
    order (the expand kernel already permuted); leftover targets convert
    zig-zag -> natural here. The scatter form is deliberately FLAT with
    1D targets: a 2D (data unit, column) scatter-add was tried and XLA:TPU
    lowered it as a transposed-copy loop (profiled 2026-08-20: 3.8 s on a
    B=8 merged batch vs ~2 ms flat). When ``dc_flat`` is given (the
    expand kernel's per-data-unit DC side vector), each round also adds
    its DC records (zig-zag index 0) there, and ``(out_flat, dc_flat)``
    is returned — int16 wrap matches the later DC wrap arithmetic."""
    from .huffman import unpack_record

    s_cap, lanes = rec.shape
    K = min(_LEFTOVER_K, lanes)
    nat = jnp.asarray(np.asarray(C.ORDER_NATURAL, np.int32))
    n_dc = 0 if dc_flat is None else dc_flat.shape[0]

    def tier(out_flat, dc_flat, left, recs):
        depth = recs.shape[0]
        slot_i = jnp.arange(depth, dtype=jnp.int32)[:, None]

        def body(state):
            out, dc, left = state
            # fill slots get the OOB index `lanes` so the clearing scatter
            # drops them — clipping them to a real lane would duplicate that
            # index and XLA leaves the winner of duplicate scatter-sets
            # unspecified (the stale True can win and the loop never
            # terminates)
            idx_raw = jnp.nonzero(left, size=K, fill_value=lanes)[0].astype(
                jnp.int32)
            sel = idx_raw < lanes
            idx = jnp.clip(idx_raw, 0, lanes - 1)
            v32, wl = unpack_record(recs[:, idx])
            v = v32.astype(jnp.int16)
            # rebase lane-local record positions to this call's range
            # (inert slots carry wl = -1)
            w = wl + (pos0[idx] - pos_offset)[None, :]
            mm = m[idx]
            ok = sel[None, :] & (slot_i < mm[None, :]) & (wl >= 0) & (w >= 0)
            w = jnp.clip(w, 0, total - 1)
            w_nat = ((w >> 6) << 6) | nat[w & 63]
            tgt = jnp.where(ok, w_nat, total)
            out = out.at[tgt.reshape(-1)].add(
                jnp.where(ok, v, 0).reshape(-1), mode="drop",
                unique_indices=False)
            if dc is not None:
                okdc = ok & ((w & 63) == 0)
                # drop slot: one past the last real data unit of the
                # padded side vector (n_dc - 1 >= total//64 always holds,
                # consumers slice [:total//64])
                dtgt = jnp.where(okdc, w >> 6, n_dc - 1)
                dc = dc.at[dtgt.reshape(-1)].add(
                    jnp.where(okdc, v, 0).reshape(-1), mode="drop",
                    unique_indices=False)
            left = left.at[idx_raw].set(False, mode="drop")
            return out, dc, left

        out_flat, dc_flat, _ = jax.lax.while_loop(
            lambda s: jnp.any(s[2]), body, (out_flat, dc_flat, left))
        return out_flat, dc_flat

    S = min(s_trim, s_cap)
    if S == s_cap:
        out_flat, dc_flat = tier(out_flat, dc_flat, leftover, rec)
    else:
        out_flat, dc_flat = tier(out_flat, dc_flat, leftover & (m <= S),
                                 rec[:S])
        out_flat, dc_flat = tier(out_flat, dc_flat, leftover & (m > S),
                                 rec)
    if dc_flat is None:
        return out_flat
    return out_flat, dc_flat


def assemble_tiles(rec, m, du0, pos0, total: int, tile_d: int = _TILE_D,
                   tile_dot: str = "f32"):
    """Full record assembly: tiles + expand + leftover + natural reorder.

    ``rec``/``pos0`` follow the packed-emission contract of
    :func:`assemble_supertiles`; this (rare, sparse-scan) path widens the
    full-depth buffer to separate value/position arrays up front.
    Returns int16[total] stream-order coefficients (natural order within
    each data unit, matching decode_write).
    """
    from .huffman import unpack_record

    v32, wl = unpack_record(rec)
    val = v32.astype(jnp.int16)
    wpos = jnp.where(wl >= 0, wl + pos0[None, :], -1)
    lanes = val.shape[1]
    assert total % C.DATA_UNIT_SIZE == 0
    n_du = total // C.DATA_UNIT_SIZE
    # emitted positions can reach total + 62 (clamped zero-value symbols of
    # the final partial segment); pad so their rows exist, plus a drop slot
    n_groups = -(-(n_du + 2) // _GROUP_DU)
    # du0 must be nondecreasing for the slab search: valid streams are by
    # construction (lane position ranges are disjoint and sorted); padded
    # lanes inherit via running max, and any lane the running max *moves*
    # is routed to the leftover path rather than silently mis-tiled
    du0_raw = du0
    du0 = jax.lax.cummax(du0)
    unsorted = du0 != du0_raw

    span_over, max_du = _lane_extents(wpos, m, du0, tile_d)
    q1 = _slab_index(du0, max_du, ~(span_over | unsorted), lanes, n_groups)
    # recordless lanes (m == 0: padding, or real lanes whose whole range was
    # clamped) can never be leftover — they have nothing to place, and the
    # padding tail would otherwise flood the compacted scatter loop with
    # thousands of no-op lanes (~7 ms per 512-lane round)
    leftover = (span_over | unsorted | _window_over(du0, q1, lanes)) \
        & (m > 0)
    # the final q excludes window-overflow lanes too; it can only move slabs
    # upward, so every lane that passed the q1 check still fits
    q = _slab_index(du0, max_du, ~leftover, lanes, n_groups)

    tiles = tiles_from_records(val, wpos, m, du0, ~leftover, tile_d,
                               tile_dot)
    out2d = expand_tiles(tiles, du0, q, n_groups)  # natural order already

    out_flat = out2d.reshape(-1)
    out_flat = scatter_leftover(out_flat, rec, m, pos0, leftover, total)
    return out_flat[:total]


def resolve_tile_mode(mode: str, auto_choice: str = "super") -> str:
    """Tuning.tile_mode -> concrete stage-1 shape. "auto" defers to the
    plan's per-scan choice (ScanConfig.tile_auto): supertiles are 3.7x
    faster than the per-lane batched dots on v5e for typical record
    densities, but sparse scans (few data units per subsequence) make the
    minimum 2-lane group span exceed the _SUPER_D window and would drain
    almost every lane through the serial leftover scatter — build_plan
    routes those to the per-lane path."""
    return auto_choice if mode == "auto" else mode


def decode_write_tiles(cfg, arrs, ctx, p, c, z, n_off, pos_base=None,
                       bound=None, total_out=None, entry=None,
                       return_dc: bool = False):
    """Drop-in for ops.huffman.decode_write using the tile-assembly path.

    With ``return_dc`` returns ``(coeffs, dc)`` where ``dc`` is the
    supertile path's per-data-unit DC side vector, or ``None`` when the
    active mode has no cheap side output (per-lane tiles) — callers fall
    back to extracting DC from the stream."""
    from . import huffman as H

    total = cfg.total_positions if total_out is None else total_out
    rec, m = H.decode_write_emit(cfg, arrs, ctx, p, c, z, n_off,
                                 pos_base=pos_base, bound=bound,
                                 total_out=total_out, entry=entry)
    seg = arrs.seg_of_subseq
    seg_pos_base = (seg * cfg.positions_per_seg if pos_base is None
                    else pos_base)
    pos0 = seg_pos_base + n_off
    du0 = pos0 >> 6
    if resolve_tile_mode(cfg.tuning.tile_mode, cfg.tile_auto) == "super":
        out = assemble_supertiles(rec, m, du0, pos0, total, cfg.super_g,
                                  cfg.super_w, s_trim=cfg.tuning.s_trim,
                                  dot=resolve_super_dot(cfg.tuning.tile_dot),
                                  expand_dot=cfg.tuning.expand_dot,
                                  return_dc=return_dc,
                                  group_du=cfg.group_du,
                                  super_d=cfg.super_d)
        return out
    coeffs = assemble_tiles(rec, m, du0, pos0, total, cfg.tile_d,
                            cfg.tuning.tile_dot)
    return (coeffs, None) if return_dc else coeffs
