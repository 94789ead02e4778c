"""Device entropy decoder: subsequence-parallel speculative Huffman decode.

TPU-native redesign of the reference's three-kernel scheme
(src/decode_huffman.cu:406-621 sync, :627-682 write): every subsequence is a
SIMD *lane* of a vectorized decoder; the intra/inter-block state
synchronization of the paper ("Accelerating JPEG Decompression on GPUs",
arXiv:2111.09219) is recast as a whole-array Jacobi fixed-point iteration on
the per-subsequence decoder states:

  round 0:  E[i] = decode(i, blind_i)            (speculative, all lanes)
  round k:  E[i] = decode(i, E[i-1])             (states shifted one lane)
  stop when E stops changing (self-synchronization typically makes this
  converge in 2-3 rounds; segment starts are exact by construction).

This removes the reference's two-level 256/512 hierarchy and its 16 MiB/scan
hard cap (decode_huffman.cu:809-814): the state shift is a pure vector
operation with no block structure, so scan size is bounded only by memory.

The per-symbol inner loop is engineered for the VPU: **no gathers**. A lane
only ever reads bits from its own 32-word subsequence plus one word on
either side, so bit loads are one-hot selects over a (lanes, 34) window that
is built once by pure layout ops; Huffman table rows are resolved by static
select chains over the <=4 scan components (baseline allows 4 DC + 4 AC
tables); symbol values come from a packed-word one-hot reduction.

Decode-state semantics match decode_huffman.cu exactly:
  p  bit position relative to the segment (never crosses a subsequence
     boundary mid-symbol; the crossing symbol belongs to the next lane),
  n  symbols (coefficient positions) produced by this subsequence,
  c  data-unit index within the MCU, z  zig-zag index within the data unit.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..config import Tuning


@dataclasses.dataclass(frozen=True)
class ScanConfig:
    """Static (hashable) per-scan decode geometry."""

    num_subseq: int
    lanes: int  # padded lane count >= num_subseq
    num_segments: int
    du_per_mcu: int
    mcus_per_seg: int
    total_mcus: int
    # per scan component: (end_slot_exclusive, dc_table_slot, ac_table_slot);
    # table slots index the packed 8-table arrays (= id*2 + class)
    comp_groups: Tuple[Tuple[int, int, int], ...]
    # canonical-limit fast symbol decode; host parser sets this False when a
    # table's code space saturates (tables.py: HuffmanTable.saturated)
    fast_tables: bool = True
    # tile depth of the tile-assembly write path (ops/write_pallas.py):
    # per-lane data-unit window, sized by build_plan from the stream's
    # average data-units-per-subsequence (a shape bucket, so equal-geometry
    # images of similar density share executables); lanes spanning more
    # drain through the leftover scatter
    tile_d: int = 96
    # supertile lane-group size of the tile_mode="super" write path
    # (ops/write_pallas.py assemble_supertiles): super_g consecutive lanes
    # share one (128, 64) data-unit supertile; sized by build_plan to a
    # typical fill <= ~35% of the 128-row window so low-entropy spans
    # rarely overflow it (see build_plan for the tradeoff data)
    super_g: int = 4
    # expand window in supertiles per output group (2x the average group
    # extent plus slack; build_plan)
    super_w: int = 8
    # data-unit rows per supertile window (ops/write_pallas.py): smaller
    # windows cut the stage-1 one-hot build (the stage's bound) linearly,
    # at the price of more span-overflow leftovers; build_plan pairs it
    # with super_g to keep typical fill <= ~35%
    super_d: int = 128
    # data units per expand-kernel output group (ops/write_pallas.py):
    # larger groups amortize the per-grid-step cost (window refetch, dot
    # issue) over more output rows at the price of a wider one-hot build
    # per row; build_plan picks it with super_w (Tuning.group_du overrides)
    group_du: int = 128
    # which stage-1 shape tile_mode="auto" resolves to for this scan
    # ("super" | "lane"): build_plan picks "lane" for sparse scans whose
    # minimum supertile-group span would overflow the 128-row window and
    # drain through the serial leftover scatter
    tile_auto: str = "super"
    # packed-huffval words per table in the symbol decode's one-hot select:
    # ceil(max table length / 4) bucketed to a multiple of 8 by build_plan
    # (the canonical AC tables have 162 symbols -> 48 rows, not 64; the
    # zero-padded tail reads 0 either way so trimming is exact)
    hv_rows: int = 64
    # per-slot packed-word counts (ceil(num_symbols/4), bucketed to a
    # multiple of 4): the select tree of _hv_byte is sized per table, so a
    # 12-symbol DC table costs ~3 selects instead of hv_rows one-hot rows
    hv_slot_rows: Tuple[int, ...] = (64,) * 8
    # static tuning knobs (part of the executable cache key)
    tuning: Tuning = Tuning()

    @property
    def total_positions(self) -> int:
        return self.total_mcus * self.du_per_mcu * C.DATA_UNIT_SIZE

    @property
    def positions_per_seg(self) -> int:
        return self.mcus_per_seg * self.du_per_mcu * C.DATA_UNIT_SIZE


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ScanArrays:
    """Device inputs for one scan."""

    words: jax.Array  # uint32[lanes*32] big-endian destuffed words
    seg_of_subseq: jax.Array  # int32[lanes]
    seg_first_lane: jax.Array  # int32[lanes] first subsequence of my segment
    seg_num_subseq: jax.Array  # int32[lanes] subsequence count of my segment
    maxcode: jax.Array  # int32[8,16]
    vsm: jax.Array  # int32[8,16] valptr - mincode
    huffval: jax.Array  # int32[8*256]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class _Ctx:
    """Precomputed per-scan decode context (built once per decode).

    All per-symbol intermediates use a (k, lanes) layout: the lane axis is
    the TPU lane dimension (multiple of 128), the small k axis lands on
    sublanes with minimal padding.
    """

    window: jax.Array  # uint32[34, lanes] own words +- one neighbor word
    hv_packed: jax.Array  # int32[8, 64] huffval bytes packed 4-per-word
    word_end: jax.Array  # int32[lanes] absolute word index of segment end
    seg_base_bits: jax.Array  # int32[lanes]
    end_subseq: jax.Array  # int32[lanes] bit bound of own subsequence
    rel: jax.Array  # int32[lanes] subsequence index within segment
    lane_valid: jax.Array  # bool[lanes]
    first_of_seg: jax.Array  # bool[lanes]
    lane_word0: jax.Array  # int32[lanes] absolute index of own word 0
    # fast-path tables (derived from maxcode/vsm/huffval, see make_ctx):
    limits: jax.Array  # uint32[8,16] running-max first-code-beyond-length-l
    dvsm: jax.Array  # int32[8,16] vsm[l+1]-vsm[l] deltas
    vsm0: jax.Array  # int32[8] vsm at length 1


def make_ctx(cfg: ScanConfig, arrs: ScanArrays,
             num_subseq=None) -> _Ctx:
    """Build the decode context. `num_subseq` may override the static
    cfg.num_subseq with a traced scalar (used by segment-sharded decode,
    where each shard owns a different number of subsequences)."""
    lanes = cfg.lanes
    words2d = arrs.words.reshape(lanes, C.CHUNK_SIZE_WORDS).T  # (32, lanes)
    prev_last = jnp.roll(words2d[-1:, :], 1, axis=1)
    next_first = jnp.roll(words2d[:1, :], -1, axis=1)
    window = jnp.concatenate([prev_last, words2d, next_first], axis=0)

    # pack huffval bytes big-endian-in-word so byte j of entry 4k+j sits at
    # bits [24-8j, ...) of word k — extracted with shifts, no gather; only
    # the first cfg.hv_rows words can be non-zero (see ScanConfig.hv_rows)
    hv = arrs.huffval.reshape(C.MAX_HUFF_PER_SCAN, 256)
    hv4 = hv.reshape(C.MAX_HUFF_PER_SCAN, 64, 4)
    hv_packed = ((hv4[..., 0] << 24) | (hv4[..., 1] << 16) |
                 (hv4[..., 2] << 8) | hv4[..., 3])[:, :cfg.hv_rows]

    # fast-path derived tables (all tiny; traced once per executable):
    # limits[t, j] = first 32-bit-left-aligned value whose code is longer
    # than j+1 bits; running max makes empty lengths inherit so that
    # `data >= limits[j]` is exactly "code length > j+1". Safe from uint32
    # overflow because saturated tables are routed to the slow path.
    lrange = np.arange(16, dtype=np.uint32)
    raw_lim = (arrs.maxcode + 1).astype(jnp.uint32) << (np.uint32(31) - lrange)[None, :]
    limits = jax.lax.cummax(raw_lim, axis=1)
    vsm = arrs.vsm
    dvsm = jnp.concatenate([vsm[:, 1:] - vsm[:, :-1],
                            jnp.zeros((C.MAX_HUFF_PER_SCAN, 1), jnp.int32)], axis=1)

    lane = jnp.arange(lanes, dtype=jnp.int32)
    rel = lane - arrs.seg_first_lane
    if num_subseq is None:
        # data-driven validity: a lane is real iff its index within its
        # segment is below the segment's subsequence count (padded lanes
        # inherit the last segment's table entries, putting rel >= count).
        # Keeping this off the static config lets images of equal geometry
        # but different stream lengths share one executable (lanes is a
        # shape bucket; the exact count rides in the staged arrays).
        lane_valid = (rel >= 0) & (rel < arrs.seg_num_subseq)
    else:
        lane_valid = lane < num_subseq
    return _Ctx(
        window=window,
        hv_packed=hv_packed,
        word_end=(arrs.seg_first_lane + arrs.seg_num_subseq) * C.CHUNK_SIZE_WORDS,
        seg_base_bits=arrs.seg_first_lane * C.SUBSEQ_SIZE_BITS,
        end_subseq=(rel + 1) * C.SUBSEQ_SIZE_BITS,
        rel=rel,
        lane_valid=lane_valid,
        first_of_seg=rel == 0,
        lane_word0=lane * C.CHUNK_SIZE_WORDS,
        limits=limits,
        dvsm=dvsm,
        vsm0=vsm[:, 0],
    )


def gather_ctx(ctx: _Ctx, idx: jax.Array, valid: jax.Array) -> _Ctx:
    """Compact a context to the given lane subset (for frontier rounds)."""
    return _Ctx(
        window=ctx.window[:, idx],
        hv_packed=ctx.hv_packed,
        word_end=ctx.word_end[idx],
        seg_base_bits=ctx.seg_base_bits[idx],
        end_subseq=ctx.end_subseq[idx],
        rel=ctx.rel[idx],
        lane_valid=valid,
        first_of_seg=ctx.first_of_seg[idx],
        lane_word0=ctx.lane_word0[idx],
        limits=ctx.limits,
        dvsm=ctx.dvsm,
        vsm0=ctx.vsm0,
    )


def _resolve_ctx_gather(cfg: ScanConfig) -> str:
    """Tuning.ctx_gather; "auto" selects the packed row gather on non-CPU
    backends and the plain take on CPU.

    Three formulations, in the order they were built:
    - "take": per-row XLA column gathers of the (34, lanes) window — ~8 ns
      per ELEMENT on XLA:TPU, the dominant cost of a compacted round.
    - "dot": one int8 one-hot MXU contraction — but it materializes a
      (lanes, K) one-hot in HBM per round; at merged-batch widths that
      dwarfs what it saves (profiled 2026-08-20: 38 ms/round at
      lanes=196608, K=16384 vs ~0.5 ms at 24576 x 4096).
    - "rows": repack the whole per-lane context as ONE contiguous
      (lanes, 40) int32 row matrix (32 own words + 6 scalars + the two
      neighbor words) built once per decode, so a compacted round is a
      single embedding-style row take along the major axis — contiguous
      128-byte-plus slices, the gather shape XLA:TPU is actually good at
      — plus one small (K, 40) transpose. Scales to any width.
    """
    mode = cfg.tuning.ctx_gather
    if mode != "auto":
        return mode
    return "take" if jax.default_backend() == "cpu" else "rows"


def make_ctx_gatherer(cfg: ScanConfig, ctx: _Ctx, arrs: ScanArrays = None):
    """Returns ``gather(idx, valid) -> _Ctx`` compacting the per-lane
    context to the given lane subset.

    The "rows" mode (production default; see _resolve_ctx_gather) packs
    each lane's whole context as one contiguous row of a (lanes, 40)
    int32 matrix — its 32 subsequence words, the two neighbor words the
    34-word window carries, and the six per-lane scalars — built ONCE per
    decode, so compacting a round is a single row ``take`` along the
    major axis (the embedding-lookup shape XLA:TPU gathers efficiently)
    plus one small (K, 40) transpose.

    The "dot" mode stacks the 34-word window and the six per-lane scalar
    rows into one (40, lanes) int32 matrix, splits it into four signed
    byte planes, and gathers columns as ``planes @ onehot`` — one int8
    MXU contraction instead of ~40 XLA gather rows. Exact: each one-hot
    column selects exactly one lane, so every output element is a single
    plane value; the int32 recombination ``sum_s(d_s << 8s) + 0x80808080``
    inverts the per-plane ``-128`` bias (two's-complement wraparound is
    part of the identity).
    """
    mode = _resolve_ctx_gather(cfg)
    if mode == "rows" and arrs is None:
        mode = "take"  # no flat word array in reach (shouldn't happen)
    if mode == "rows":
        lanes = cfg.lanes
        words2d = jax.lax.bitcast_convert_type(
            arrs.words.reshape(lanes, C.CHUNK_SIZE_WORDS), jnp.int32)
        # neighbor words come from ctx.window rows 0/33, NOT a re-roll of
        # words2d: subsequence-sharded decode patches lane 0's window row
        # 0 with the previous shard's straddle word (parallel/segments.py)
        # and the rebuild must preserve that
        nbr = jax.lax.bitcast_convert_type(
            ctx.window[jnp.array([0, 33])], jnp.int32).T  # (lanes, 2)
        gmat = jnp.concatenate([
            words2d,                                          # 0..31
            ctx.word_end[:, None],                            # 32
            ctx.seg_base_bits[:, None],                       # 33
            ctx.end_subseq[:, None],                          # 34
            ctx.rel[:, None],                                 # 35
            ctx.lane_word0[:, None],                          # 36
            ctx.first_of_seg.astype(jnp.int32)[:, None],      # 37
            nbr,                                              # 38, 39
        ], axis=1)

        def gather_rows(idx, valid):
            g = jnp.take(gmat, idx, axis=0).T  # (40, K)
            window = jnp.concatenate(
                [g[38:39], g[0:32], g[39:40]], axis=0)
            return _Ctx(
                window=jax.lax.bitcast_convert_type(window,
                                                    ctx.window.dtype),
                hv_packed=ctx.hv_packed,
                word_end=g[32],
                seg_base_bits=g[33],
                end_subseq=g[34],
                rel=g[35],
                lane_valid=valid,
                first_of_seg=g[37] != 0,
                lane_word0=g[36],
                limits=ctx.limits,
                dvsm=ctx.dvsm,
                vsm0=ctx.vsm0,
            )

        return gather_rows
    if mode != "dot":
        return functools.partial(gather_ctx, ctx)
    lanes = cfg.lanes
    win32 = jax.lax.bitcast_convert_type(ctx.window, jnp.int32)
    rows = jnp.concatenate([
        win32,                                   # rows 0..33
        ctx.word_end[None, :],                   # 34
        ctx.seg_base_bits[None, :],              # 35
        ctx.end_subseq[None, :],                 # 36
        ctx.rel[None, :],                        # 37
        ctx.lane_word0[None, :],                 # 38
        ctx.first_of_seg.astype(jnp.int32)[None, :],  # 39
    ], axis=0)
    R = rows.shape[0]
    planes = jnp.concatenate(
        [(((rows >> (8 * s)) & 255) - 128).astype(jnp.int8)
         for s in range(4)], axis=0)  # (4R, lanes)
    iota = jnp.arange(lanes, dtype=jnp.int32)
    bias = jnp.int32(-2139062144)  # 0x80808080 as int32

    def gather(idx, valid):
        oh = (iota[:, None] == idx[None, :]).astype(jnp.int8)
        d = jax.lax.dot_general(planes, oh, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        g = (d[:R] + (d[R:2 * R] << 8) + (d[2 * R:3 * R] << 16)
             + (d[3 * R:] << 24) + bias)
        return _Ctx(
            window=jax.lax.bitcast_convert_type(g[:34], ctx.window.dtype),
            hv_packed=ctx.hv_packed,
            word_end=g[34],
            seg_base_bits=g[35],
            end_subseq=g[36],
            rel=g[37],
            lane_valid=valid,
            first_of_seg=g[39] != 0,
            lane_word0=g[38],
            limits=ctx.limits,
            dvsm=ctx.dvsm,
            vsm0=ctx.vsm0,
        )

    return gather


def _slice_ctx(gctx: _Ctx, lo: int, hi: int, valid: jax.Array) -> _Ctx:
    """Static column slice of an already-gathered context (frontier phases
    share one fused gather and slice their phase out of it)."""
    return _Ctx(
        window=gctx.window[:, lo:hi],
        hv_packed=gctx.hv_packed,
        word_end=gctx.word_end[lo:hi],
        seg_base_bits=gctx.seg_base_bits[lo:hi],
        end_subseq=gctx.end_subseq[lo:hi],
        rel=gctx.rel[lo:hi],
        lane_valid=valid,
        first_of_seg=gctx.first_of_seg[lo:hi],
        lane_word0=gctx.lane_word0[lo:hi],
        limits=gctx.limits,
        dvsm=gctx.dvsm,
        vsm0=gctx.vsm0,
    )


def _iota_col(n: int) -> jax.Array:
    """(n, 1) int32 iota — broadcasted_iota lowers inside Pallas kernels,
    where captured constant arrays and 1D iota ops do not."""
    return jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)


# rolling bit-buffer of the subsequence-pass loops: _BUF_W words are
# one-hot-loaded from the 34-word window ONCE per unrolled iteration, and
# each symbol reads its 32 bits with a cheap funnel shift — cutting the
# dominant per-symbol cost (two 34-row one-hot selects in _load32, ~60% of
# a pass) to a once-per-iteration refill. A lane that consumes past the
# buffer mid-iteration *stalls* (no commit, stays active) and resumes after
# the next refill re-centers the buffer — pure delay, bit-identical states.
# 8 words = 256 bits: a stall needs >= (256-32-31)/31 -> 7 commits first,
# so at unroll 8 the emission-slot inflation is bounded by 8/7 (_emit_cap).
_BUF_W = 8
_BUF_BITS = _BUF_W * 32


def _resolve_refill(cfg: ScanConfig) -> str:
    """Tuning.refill. "auto" selects the row-shift tree on non-CPU
    backends (the timing evidence is TPU v5e; on other accelerators the
    formulations are bit-identical, only relative speed is unmeasured)
    and the one-hot on CPU. Validated on v5e (2026-08-18,
    scripts/sweep.py --what sync): shift alone is neutral (15.9 vs 16.0
    ms sync) but combined with hv_lookup=tree + category=bsearch the
    sync pass drops 14.96 -> 5.42 ms, so the three flip together."""
    mode = cfg.tuning.refill
    if mode == "auto":
        return "onehot" if jax.default_backend() == "cpu" else "shift"
    return mode


def _refill_buf(cfg: ScanConfig, ctx: _Ctx, p: jax.Array):
    """_BUF_W buffer words from absolute word floor(abs_bit/32), plus the
    base word index. Words at/past the segment end read zero (reference
    reader semantics, decode_huffman_reader.hpp:72-112).

    Tuning.refill="shift": the window rows are shifted down by the
    per-lane offset with a conditional row-shift tree (6 selects over the
    34-row window) instead of 8 independent one-hot row sums — ~4x fewer
    vector rows per refill. Rows shifted past the window end read zero,
    which the one-hot's missed match also produced; negative and
    out-of-window offsets shift everything out and read zero the same
    way. "auto" resolves via _resolve_refill: shift on non-CPU backends
    (validated on v5e 2026-08-18, scripts/sweep.py), one-hot on CPU."""
    abs_bit = ctx.seg_base_bits + p
    base = abs_bit >> 5
    w_rel = base - ctx.lane_word0 + 1  # in [0, 33] for in-window reads
    win_i = jax.lax.bitcast_convert_type(ctx.window, jnp.int32)
    words = []
    if _resolve_refill(cfg) == "shift":
        rows = ctx.window.shape[0]
        x = win_i
        zero_rows = jnp.zeros_like(x)
        s = 32
        while s:
            bit = (w_rel & s) != 0
            if s < rows:
                shifted = jnp.concatenate([x[s:], zero_rows[:s]], axis=0)
            else:
                shifted = zero_rows
            # bit[None] (not bit[None, :]): the lane axis may be folded 2D
            # ((8, w/8) sublane-major inside the Pallas kernels)
            x = jnp.where(bit[None], shifted, x)
            s >>= 1
        for k in range(_BUF_W):
            wk = jax.lax.bitcast_convert_type(
                jnp.where(base + k < ctx.word_end, x[k], 0), jnp.uint32)
            words.append(wk)
        return tuple(words), base
    iota = _iota_col(34)
    d = iota - w_rel[None, :]
    for k in range(_BUF_W):
        wk = jnp.sum(jnp.where(d == k, win_i, 0), axis=0)
        wk = jax.lax.bitcast_convert_type(
            jnp.where(base + k < ctx.word_end, wk, 0), jnp.uint32)
        words.append(wk)
    return tuple(words), base


def _load32_buf(ctx: _Ctx, p: jax.Array, buf, base):
    """32 MSB-aligned bits at p from the rolling buffer.

    Returns (data, stall): stalled lanes (p beyond the buffer) get garbage
    data and must not commit this step.
    """
    off = (ctx.seg_base_bits + p) - (base << 5)
    stall = off >= _BUF_BITS - 32
    j = jnp.clip(off >> 5, 0, _BUF_W - 2)
    wa, wb = buf[_BUF_W - 2], buf[_BUF_W - 1]
    for k in range(_BUF_W - 2):
        m = j == k
        wa = jnp.where(m, buf[k], wa)
        wb = jnp.where(m, buf[k + 1], wb)
    sh = (off & 31).astype(jnp.uint32)
    hi = wa << sh
    lo = jnp.where(sh > 0, wb >> ((np.uint32(32) - sh) & np.uint32(31)), 0)
    return hi | lo, stall


def _symbol_step_buf(cfg: ScanConfig, arrs: ScanArrays, ctx: _Ctx, buf, base,
                     p, c, z, active):
    """One masked symbol step off the rolling buffer (sync passes: the
    EXTEND value is not computed). Returns (p, c, z, run, commit, active):
    stalled lanes stay active without committing."""
    data, stall = _load32_buf(ctx, p, buf, base)
    length, _, run = _decode_symbol(cfg, arrs, ctx, data, c, z,
                                    need_value=False)
    ok = active & ~stall
    fits = p + length <= ctx.end_subseq
    commit = ok & fits
    active = active & ~(ok & ~fits)
    p = jnp.where(commit, p + length, p)
    z_new = z + run + 1
    wrap = z_new >= 64
    c_new = jnp.where(wrap, c + 1, c)
    c_new = jnp.where(c_new >= cfg.du_per_mcu, 0, c_new)
    z = jnp.where(commit, jnp.where(wrap, 0, z_new), z)
    c = jnp.where(commit, c_new, c)
    return p, c, z, run, commit, active


def _load32(ctx: _Ctx, p: jax.Array) -> jax.Array:
    """Next 32 bits MSB-aligned at segment-relative bit p, zero past the
    segment end (reference reader semantics,
    decode_huffman_reader.hpp:72-112). Pure one-hot selects — no gather."""
    abs_bit = ctx.seg_base_bits + p
    w = abs_bit >> 5
    b = (abs_bit & 31).astype(jnp.uint32)
    # index into the 34-word window; 0 is the previous lane's last word
    w_rel = w - ctx.lane_word0 + 1
    iota = _iota_col(34)
    oh0 = iota == w_rel[None, :]
    oh1 = iota == (w_rel + 1)[None, :]
    # reduce in int32 (Mosaic has no unsigned reductions), bitcast back
    win_i = jax.lax.bitcast_convert_type(ctx.window, jnp.int32)
    w0 = jnp.sum(jnp.where(oh0, win_i, 0), axis=0)
    w1 = jnp.sum(jnp.where(oh1, win_i, 0), axis=0)
    w0 = jax.lax.bitcast_convert_type(
        jnp.where(w < ctx.word_end, w0, 0), jnp.uint32)
    w1 = jax.lax.bitcast_convert_type(
        jnp.where(w + 1 < ctx.word_end, w1, 0), jnp.uint32)
    hi = w0 << b
    lo = jnp.where(b > 0, w1 >> ((np.uint32(32) - b) & np.uint32(31)), 0)
    return hi | lo


def _select_rows_t(cfg: ScanConfig, table: jax.Array, c: jax.Array,
                   is_dc: jax.Array) -> jax.Array:
    """Per-lane (16,) table row as (16, lanes), resolved by a static select
    chain over the scan components and DC/AC class."""
    groups = cfg.comp_groups

    def row_for(g):
        dc_row = table[g[1]][:, None]  # (16, 1) static slice
        ac_row = table[g[2]][:, None]
        return jnp.where(is_dc[None, :], dc_row, ac_row)

    out = row_for(groups[-1])
    for g in reversed(groups[:-1]):
        out = jnp.where((c < g[0])[None, :], row_for(g), out)
    return out


def _hv_byte_onehot(cfg: ScanConfig, ctx: _Ctx, idx: jax.Array,
                    c: jax.Array, is_dc: jax.Array) -> jax.Array:
    """``huffval[table(c, is_dc)][idx]`` via a blended one-hot row sum.

    Fewer, larger HLO ops than the select tree — cheaper to trace/compile
    (the CPU interpret-mode suite) but ~3x the VPU row work per symbol.
    """
    word_i = idx >> 2
    byte_i = idx & 3
    iota64 = _iota_col(ctx.hv_packed.shape[1])
    oh_w = iota64 == word_i[None, :]
    groups = cfg.comp_groups

    def hv_row(g):
        return jnp.where(is_dc[None, :], ctx.hv_packed[g[1]][:, None],
                         ctx.hv_packed[g[2]][:, None])

    hv = hv_row(groups[-1])
    for g in reversed(groups[:-1]):
        hv = jnp.where((c < g[0])[None, :], hv_row(g), hv)
    packed = jnp.sum(jnp.where(oh_w, hv, 0), axis=0)
    return (packed >> ((3 - byte_i) * 8)) & 0xFF


def _resolve_hv_lookup(cfg: ScanConfig) -> str:
    """Tuning.hv_lookup. "auto" selects the select tree on non-CPU
    backends (timing evidence is TPU v5e, 2026-08-18, scripts/sweep.py
    --what sync: tree alone cuts the sync pass 14.96 -> 9.38 ms; with
    bsearch+shift it reaches 5.42 ms) and the one-hot on CPU, where the
    tree's many small ops triple interpret-mode trace time. Both
    formulations are bit-identical and cross-tested."""
    mode = cfg.tuning.hv_lookup
    if mode == "auto":
        return "onehot" if jax.default_backend() == "cpu" else "tree"
    return mode


def _hv_byte(cfg: ScanConfig, ctx: _Ctx, idx: jax.Array, c: jax.Array,
             is_dc: jax.Array) -> jax.Array:
    """``huffval[table(c, is_dc)][idx]`` byte via per-slot select trees.

    The per-lane table blend is deferred until after per-table scalar
    results exist, and each distinct table slot runs a binary select tree
    over its OWN static packed-word count (cfg.hv_slot_rows) — a 12-symbol
    DC table costs ~3 selects where the one-hot formulation paid
    ``hv_rows`` compare+select+add rows after blending full (rows, lanes)
    operands per symbol. Exact for any idx in [0, 256): words at/past a
    table's length read 0 (zero-padded tails + the final range guard),
    matching the one-hot/reference clamp semantics
    (decode_huffman.cu:167-194).
    """
    if _resolve_hv_lookup(cfg) == "onehot":
        return _hv_byte_onehot(cfg, ctx, idx, c, is_dc)
    word_i = idx >> 2
    byte_i = idx & 3
    groups = cfg.comp_groups
    slots: list = []
    for g in groups:
        for t in (g[1], g[2]):
            if t not in slots:
                slots.append(t)
    avail = ctx.hv_packed.shape[1]
    levels_max = max(
        (min(cfg.hv_slot_rows[t], avail) - 1).bit_length() for t in slots)
    bits = [(word_i >> k) & 1 == 1 for k in range(levels_max)]

    picked = {}
    for t in slots:
        m = min(cfg.hv_slot_rows[t], avail)
        vals = [ctx.hv_packed[t, j] for j in range(m)]
        level = 0
        while len(vals) > 1:
            nxt = []
            for i in range(0, len(vals) - 1, 2):
                nxt.append(jnp.where(bits[level], vals[i + 1], vals[i]))
            if len(vals) & 1:  # odd tail: implicit zero partner
                nxt.append(jnp.where(bits[level], 0, vals[-1]))
            vals = nxt
            level += 1
        r = vals[0]
        # bits above the tree depth would alias low words; they must read 0
        picked[t] = jnp.where(word_i < (1 << level), r, 0)

    def pick(g):
        return jnp.where(is_dc, picked[g[1]], picked[g[2]])

    packed = pick(groups[-1])
    for g in reversed(groups[:-1]):
        packed = jnp.where(c < g[0], pick(g), packed)
    return (packed >> ((3 - byte_i) * 8)) & 0xFF


def _category_slow(cfg: ScanConfig, arrs: ScanArrays, ctx: _Ctx,
                   data: jax.Array, c: jax.Array, is_dc: jax.Array):
    """maxcode-comparison category decode (handles saturated tables)."""
    # category code: first length l (1..16) whose l-bit prefix <= maxcode[l]
    iota16_col = _iota_col(16)
    shifts = (31 - iota16_col).astype(jnp.uint32)
    codes = (data[None, :] >> shifts).astype(jnp.int32)  # (16, S)
    maxc = _select_rows_t(cfg, arrs.maxcode, c, is_dc)
    # l=16 always terminates (:182-186)
    le = jnp.logical_or(codes <= maxc, iota16_col == 15)
    l_idx = jnp.argmax(le, axis=0).astype(jnp.int32)  # first match, 0-based
    cat_len = l_idx + 1
    # the matched code itself: top cat_len bits of data
    code = (data >> (np.uint32(32) - cat_len.astype(jnp.uint32))).astype(jnp.int32)
    vsm_rows = _select_rows_t(cfg, arrs.vsm, c, is_dc)
    vsm = jnp.sum(jnp.where(iota16_col == l_idx[None, :], vsm_rows, 0), axis=0)
    idx = (vsm + code) & 0xFF
    sym_cat = _hv_byte(cfg, ctx, idx, c, is_dc)
    return cat_len, sym_cat


def _resolve_category(cfg: ScanConfig) -> str:
    """Tuning.category. "auto" selects the binary search on non-CPU
    backends (timing evidence is TPU v5e, 2026-08-18, scripts/sweep.py
    --what sync: bsearch alone cuts the sync pass 14.96 -> 13.13 ms; with
    tree+shift it reaches 5.42 ms) and the mask popcount on CPU."""
    mode = cfg.tuning.category
    if mode == "auto":
        return "mask" if jax.default_backend() == "cpu" else "bsearch"
    return mode


def _catlen_vsm_bsearch(cfg: ScanConfig, arrs: ScanArrays, ctx: _Ctx,
                        data: jax.Array, c: jax.Array, is_dc: jax.Array):
    """Branchless binary-search form of the canonical-limit decode.

    limits[t] is nondecreasing (cummax), so ``rank = #{j < 15: data >=
    limits[j]}`` is a lower-bound search: 4 compares whose thresholds are
    selected by the prior decision bits, per distinct table slot. The
    valptr-mincode offset is then ``vsm[t][rank]`` directly (the mask
    formulation's telescoped sum), looked up by a select tree on the same
    bits. Identical results to the mask popcount; ~1.5x fewer vector rows
    per symbol.
    """
    groups = cfg.comp_groups
    slots: list = []
    for g in groups:
        for t in (g[1], g[2]):
            if t not in slots:
                slots.append(t)

    res = {}
    for t in slots:
        lim = [ctx.limits[t, j] for j in range(15)]
        vsmt = [arrs.vsm[t, j] for j in range(16)]
        b3 = data >= lim[7]                      # rank >= 8
        thr = jnp.where(b3, lim[11], lim[3])
        b2 = data >= thr                         # rank >= 8*b3 + 4
        t01 = jnp.where(b2, lim[5], lim[1])
        t23 = jnp.where(b2, lim[13], lim[9])
        b1 = data >= jnp.where(b3, t23, t01)
        e01 = jnp.where(b1, lim[2], lim[0])
        e23 = jnp.where(b1, lim[6], lim[4])
        e45 = jnp.where(b1, lim[10], lim[8])
        e67 = jnp.where(b1, lim[14], lim[12])
        lo = jnp.where(b2, e23, e01)
        hi = jnp.where(b2, e67, e45)
        b0 = data >= jnp.where(b3, hi, lo)
        rank = (b3.astype(jnp.int32) * 8 + b2.astype(jnp.int32) * 4
                + b1.astype(jnp.int32) * 2 + b0.astype(jnp.int32))
        v = vsmt
        for bit in (b0, b1, b2, b3):
            v = [jnp.where(bit, v[2 * i + 1], v[2 * i])
                 for i in range(len(v) // 2)]
        res[t] = (rank, v[0])

    def pick(g, k):
        return jnp.where(is_dc, res[g[1]][k], res[g[2]][k])

    rank = pick(groups[-1], 0)
    vsm = pick(groups[-1], 1)
    for g in reversed(groups[:-1]):
        sel = c < g[0]
        rank = jnp.where(sel, pick(g, 0), rank)
        vsm = jnp.where(sel, pick(g, 1), vsm)
    return 1 + rank, vsm


def _category_fast(cfg: ScanConfig, arrs: ScanArrays, ctx: _Ctx,
                   data: jax.Array, c: jax.Array, is_dc: jax.Array):
    """Canonical-limit category decode (exact for unsaturated tables).

    `data >= limits[j]` is precisely "code longer than j+1 bits" (canonical
    code space below each boundary is contiguous), so the length is a popcount
    of limit comparisons (or an equivalent branchless binary search, see
    _catlen_vsm_bsearch), and the valptr-mincode offset telescopes along the
    same mask.
    """
    groups = cfg.comp_groups

    if _resolve_category(cfg) == "bsearch":
        cat_len, vsm = _catlen_vsm_bsearch(cfg, arrs, ctx, data, c, is_dc)
    else:
        def rows(tbl):
            def row_for(g):
                return jnp.where(is_dc[None, :], tbl[g[1]][:, None],
                                 tbl[g[2]][:, None])
            out = row_for(groups[-1])
            for g in reversed(groups[:-1]):
                out = jnp.where((c < g[0])[None, :], row_for(g), out)
            return out

        lim = rows(ctx.limits)  # (16,S) uint32; row j <-> length j+1
        ge = data[None, :] >= lim
        ge15 = ge[:15]
        cat_len = 1 + jnp.sum(ge15.astype(jnp.int32), axis=0)
        dv = rows(ctx.dvsm)[:15]
        vsm0 = _select_scalar_t(cfg, ctx.vsm0, c, is_dc)
        vsm = vsm0 + jnp.sum(jnp.where(ge15, dv, 0), axis=0)
    code = (data >> (np.uint32(32) - cat_len.astype(jnp.uint32))).astype(jnp.int32)
    idx = (vsm + code) & 0xFF
    # symbol byte via per-table select trees (an MXU one-hot formulation
    # was tried and lost: 16-wide contractions underutilize it)
    sym_cat = _hv_byte(cfg, ctx, idx, c, is_dc)
    return cat_len, sym_cat


def _select_scalar_t(cfg: ScanConfig, tbl: jax.Array, c: jax.Array,
                     is_dc: jax.Array) -> jax.Array:
    groups = cfg.comp_groups
    out = jnp.where(is_dc, tbl[groups[-1][1]], tbl[groups[-1][2]])
    for g in reversed(groups[:-1]):
        out = jnp.where(c < g[0], jnp.where(is_dc, tbl[g[1]], tbl[g[2]]), out)
    return out


def _decode_symbol(cfg: ScanConfig, arrs: ScanArrays, ctx: _Ctx,
                   data: jax.Array, c: jax.Array, z: jax.Array,
                   need_value: bool = True):
    """Vectorized one-symbol decode on all lanes.

    Returns (length, sym, run). Mirrors decode_next_symbol
    (decode_huffman.cu:202-286) including the uint8 index clamp on garbage.
    With ``need_value=False`` (sync passes, which only track states) the
    EXTEND value computation is skipped and sym is 0.
    """
    is_dc = z == 0
    if cfg.fast_tables:
        cat_len, sym_cat = _category_fast(cfg, arrs, ctx, data, c, is_dc)
    else:
        cat_len, sym_cat = _category_slow(cfg, arrs, ctx, data, c, is_dc)

    run_ac = sym_cat >> 4
    cat_ac = sym_cat & 0xF
    cat = jnp.where(is_dc, sym_cat, cat_ac)
    run = jnp.where(
        is_dc, 0,
        jnp.where(cat_ac == 0, jnp.where(run_ac == 15, 15, 63 - z), run_ac))

    has_val = cat > 0
    length = cat_len + jnp.where(has_val, cat, 0)
    if not need_value:
        return length, jnp.zeros_like(cat), run

    # value bits (T.81 F.12 EXTEND); shift amounts guarded for garbage cat
    cat_u = cat.astype(jnp.uint32)
    off = (data << (cat_len.astype(jnp.uint32) & np.uint32(31)))
    off = (off >> ((np.uint32(32) - cat_u) & np.uint32(31))).astype(jnp.int32)
    cat_c = jnp.minimum(cat, 31)
    half = (jnp.int32(1) << cat_c) >> 1
    value = jnp.where(off < half, off - (jnp.int32(1) << cat_c) + 1, off)
    sym = jnp.where(has_val, value, 0)
    return length, sym, run


def _symbol_step(cfg: ScanConfig, arrs: ScanArrays, ctx: _Ctx,
                 p, c, z, active):
    """One masked symbol step; returns (p, c, z, run, commit) after it."""
    data = _load32(ctx, p)
    length, sym, run = _decode_symbol(cfg, arrs, ctx, data, c, z)
    crosses = p + length > ctx.end_subseq
    commit = active & ~crosses
    p = jnp.where(commit, p + length, p)
    z_new = z + run + 1
    wrap = z_new >= 64
    c_new = jnp.where(wrap, c + 1, c)
    c_new = jnp.where(c_new >= cfg.du_per_mcu, 0, c_new)
    z = jnp.where(commit, jnp.where(wrap, 0, z_new), z)
    c = jnp.where(commit, c_new, c)
    return p, c, z, sym, run, commit


def _resolve_unroll(cfg: ScanConfig) -> int:
    """Tuning.unroll, with 0 = auto: 16 on TPU backends (measured best for
    the rolling-buffer loops), 8 elsewhere (CPU pays the body size twice
    over in compile time)."""
    u = cfg.tuning.unroll
    if u == 0:
        return 8 if jax.default_backend() == "cpu" else 16
    return u


def _resolve_entropy_backend(cfg: ScanConfig) -> str:
    backend = cfg.tuning.entropy_backend
    if backend == "auto":
        return "xla" if jax.default_backend() == "cpu" else "pallas"
    return backend


def _decode_subseq_pass(cfg: ScanConfig, arrs: ScanArrays, ctx: _Ctx,
                        p0, c0, z0, active0):
    """Decode each lane's own subsequence from the given start state.

    Per-lane loop until the next symbol would cross the lane's subsequence
    end (decode_subsequence, decode_huffman.cu:302-394, do_write=false).
    Returns (p, c, z, n). Dispatches to the fused Pallas kernel or the XLA
    loop per cfg.tuning.entropy_backend.
    """
    if _resolve_entropy_backend(cfg) == "pallas":
        from . import huffman_pallas

        return huffman_pallas.subseq_pass(cfg, arrs, ctx, p0, c0, z0, active0)
    return _decode_subseq_pass_xla(cfg, arrs, ctx, p0, c0, z0, active0)


def _decode_subseq_pass_xla(cfg: ScanConfig, arrs: ScanArrays, ctx: _Ctx,
                            p0, c0, z0, active0):

    def body(state):
        p, c, z, n, active, _ = state
        # refill the rolling bit buffer once, then run the unrolled symbol
        # steps off it (amortizes the one-hot window selects AND the
        # per-iteration fixed cost which otherwise dominate the VPU work)
        buf, base = _refill_buf(cfg, ctx, p)
        for _u in range(_resolve_unroll(cfg)):
            p, c, z, run, commit, active = _symbol_step_buf(
                cfg, arrs, ctx, buf, base, p, c, z, active)
            n = jnp.where(commit, n + run + 1, n)
        return p, c, z, n, active, jnp.any(active)

    def cond(state):
        return state[5]

    n0 = jnp.zeros(p0.shape, jnp.int32)
    active0 = active0 & (p0 < ctx.end_subseq)
    init = (p0, c0, z0, n0, active0, jnp.any(active0))
    p, c, z, n, _, _ = jax.lax.while_loop(cond, body, init)
    return p, c, z, n


def _resolve_sync_tiers(cfg: ScanConfig) -> str:
    """Tuning.sync_tiers: shape of the post-round-1 compacted tiers.
    "ladder" is the halving tier ladder (see sync_states), "classic" the
    2+1-tier structure. "auto" selects ladder on non-CPU backends (v5e
    2026-08-20 r5: 4.66 ms sync vs 6.15 classic on the 12 MP bench) —
    on CPU the ~8 extra traced pass bodies are pure compile cost."""
    mode = cfg.tuning.sync_tiers
    if mode != "auto":
        return mode
    return "classic" if jax.default_backend() == "cpu" else "ladder"


def _resolve_frontier_width(cfg: ScanConfig) -> int:
    """Tuning.frontier_width; 0 = auto (the 2048-lane compacted tiers,
    or lanes/2 for the ladder — its top tier IS the compaction budget).

    A full-width-Jacobi-only mode (no compaction; pass frontier_width=0
    to sync_states directly) was measured on v5e 2026-08-20 and LOST:
    one full masked round costs ~0.65 ms (round2 slope probe; a pass is
    bound by per-symbol fixed costs, not width) so the image's 15
    Jacobi rounds run 13.1 ms where the tiers' compacted rounds finish
    in 6.6 ms. Keep the tiers.

    Auto scales with the lane count (lanes/12 = the tuned 2048 at the 12 MP
    single-image width): merged-lane BATCHES multiply lanes by B, and a
    fixed width would force ~log2(B) extra FULL-width rounds — each B
    times a single image's pass — before the frontier fits the tier."""
    fw = cfg.tuning.frontier_width
    if fw != 0:
        return fw
    if _resolve_sync_tiers(cfg) == "ladder":
        # lanes/4 (6144 at the 12 MP width) measured best on v5e
        # (2026-08-20 r5: 4.87 ms vs 5.15 at lanes/6 and 6.97 at lanes/2
        # — one full round for the 42% post-round-1 frontier, then
        # halving tiers; a lanes/2 top tier pays a 12k-wide gather +
        # scatter round for a 10k frontier a full round handles cheaper)
        return max(128, cfg.lanes // 4)
    return max(2048, cfg.lanes // 12)


def sync_states(cfg: ScanConfig, arrs: ScanArrays, ctx: _Ctx,
                frontier_width: int | None = None, diag: bool = False,
                entry=None):
    """Fixed-point synchronization of subsequence decoder states.

    Round 0 decodes every subsequence speculatively ("blind"); round 1
    re-decodes every subsequence from its predecessor's end state (almost
    all lanes self-synchronize here). Remaining mis-synced chains propagate
    one subsequence per round, so later rounds touch only the *frontier* —
    lanes whose predecessor changed last round. Those are compacted into a
    fixed `frontier_width` set so long chains cost narrow rounds instead of
    full-width passes; if a frontier ever exceeds the width, that round
    falls back to a full-width pass.

    ``entry``, if given, is a ``(p, c, z)`` scalar tuple used as lane 0's
    predecessor state when lane 0 is not a segment first — the cross-shard
    boundary state of subsequence-sharded decode (parallel/segments.py),
    segment-relative like every decoder state so it transfers between
    shards unchanged.

    Returns converged (p, c, z, n) per subsequence: the state *after*
    decoding subsequence i, with n the per-subsequence symbol count.
    """
    lanes = cfg.lanes
    if frontier_width is None:
        frontier_width = _resolve_frontier_width(cfg)
    K = min(frontier_width, lanes)
    blind_p = ctx.rel * C.SUBSEQ_SIZE_BITS
    zeros = jnp.zeros(lanes, jnp.int32)

    p, c, z, n = _decode_subseq_pass(cfg, arrs, ctx, blind_p, zeros, zeros,
                                     ctx.lane_valid)
    if cfg.num_subseq <= 1 and entry is None:
        if diag:
            return p, c, z, n, jnp.int32(0), jnp.int32(0)
        return p, c, z, n

    def shift_start(p, c, z):
        # start of lane i = end state of lane i-1; segment firsts are exact
        sp = jnp.where(ctx.first_of_seg, blind_p, jnp.roll(p, 1))
        sc = jnp.where(ctx.first_of_seg, 0, jnp.roll(c, 1))
        sz = jnp.where(ctx.first_of_seg, 0, jnp.roll(z, 1))
        if entry is not None:
            use = ~ctx.first_of_seg[0]
            sp = sp.at[0].set(jnp.where(use, entry[0], sp[0]))
            sc = sc.at[0].set(jnp.where(use, entry[1], sc[0]))
            sz = sz.at[0].set(jnp.where(use, entry[2], sz[0]))
        return sp, sc, sz

    def freeze(p2, c2, z2, n2):
        # padded lanes stay frozen so they never delay convergence
        return (jnp.where(ctx.lane_valid, p2, blind_p),
                jnp.where(ctx.lane_valid, c2, 0),
                jnp.where(ctx.lane_valid, z2, 0),
                jnp.where(ctx.lane_valid, n2, 0))

    # round 1: full width
    sp, sc, sz = shift_start(p, c, z)
    p2, c2, z2, n2 = freeze(*_decode_subseq_pass(cfg, arrs, ctx, sp, sc, sz,
                                                 ctx.lane_valid))
    delta = (p2 != p) | (c2 != c) | (z2 != z)
    p, c, z, n = p2, c2, z2, n2

    def full_round(p, c, z, n):
        sp, sc, sz = shift_start(p, c, z)
        p2, c2, z2, n2 = freeze(*_decode_subseq_pass(
            cfg, arrs, ctx, sp, sc, sz, ctx.lane_valid))
        delta = (p2 != p) | (c2 != c) | (z2 != z)
        return p2, c2, z2, n2, delta

    # chain-follow: each compacted round re-decodes up to F consecutive
    # subsequences per mis-synced chain (Gauss-Seidel within the chain:
    # phase f starts from phase f-1's fresh end state), so a chain of
    # depth d drains in ceil(d/F) rounds instead of d. Chains are bounded
    # by the next chain's head, so updated columns stay disjoint.
    F = cfg.tuning.chain_follow
    if F == 0:  # auto: the F-phase round body is pure compile cost on CPU
        # TPU: 2 (one-session A/B, v5e 2026-08-20 sweep: chain_follow=2 +
        # head_width 1024 sync 7.31 ms vs 8.0 at F=4 — shallower follow
        # halves the per-round gather width and the real chains are short)
        F = 1 if jax.default_backend() == "cpu" else 2
    F = min(F, max(K, 1))
    Fw = min(cfg.tuning.wide_follow or 1, max(K, 1))
    Kc = cfg.tuning.head_width or max(1, K // max(F, 1))
    Kc = min(Kc, lanes, max(K, 1))

    # lanes eligible for the frontier; lane 0's predecessor is the fixed
    # `entry` (never changes within one call), so it never re-enters — and
    # the roll wrap from the last lane must not drag it in
    frontier_ok = ~ctx.first_of_seg & ctx.lane_valid
    if entry is not None:
        frontier_ok = frontier_ok & (
            jnp.arange(lanes, dtype=jnp.int32) > 0)

    # Phase A: full-width rounds while the mis-synced frontier exceeds the
    # compaction budget K (compaction at that scale costs more in
    # nonzero/gather than the pass it saves).
    def full_body(state):
        p, c, z, n, delta, it = state
        p, c, z, n, delta = full_round(p, c, z, n)
        return p, c, z, n, delta, it + 1

    def full_cond(state):
        p, c, z, n, delta, it = state
        frontier = jnp.roll(delta, 1) & frontier_ok
        return (jnp.sum(frontier.astype(jnp.int32)) > K) & (it < lanes)

    p, c, z, n, delta, it0 = jax.lax.while_loop(
        full_cond, full_body, (p, c, z, n, delta, jnp.int32(0)))

    if frontier_width == 0:
        # full-width Jacobi to convergence (K == 0: the phase-A loop above
        # ran until the frontier was empty); no compacted tiers at all
        if diag:
            return p, c, z, n, it0, it0
        return p, c, z, n

    gather_fn = make_ctx_gatherer(cfg, ctx, arrs)

    def compact_round(p, c, z, n, head, width, follow):
        """One chain-follow round over up to `width` local chain heads,
        each advanced up to `follow` columns (Gauss-Seidel within the
        chain). Heads stay sorted and distinct: a chain is bounded by the
        next live head, so its next head never passes a neighbor; dead
        heads hold the `lanes` sentinel."""
        offs = jnp.arange(follow, dtype=jnp.int32)
        sentinel = lanes + jnp.arange(width * follow,
                                      dtype=jnp.int32).reshape(width, follow)
        alive = head < lanes
        headc = jnp.clip(head, 0, lanes - 1)
        # bound[j] = the closest live head above (dead heads sit at the
        # `lanes` sentinel and never bound anyone)
        nxt = jnp.concatenate([head[1:], jnp.full((1,), lanes, jnp.int32)])
        bound = jnp.flip(jax.lax.cummin(jnp.flip(nxt)))
        idx2 = headc[:, None] + offs[None, :]  # (width, follow) columns
        idx2c = jnp.clip(idx2, 0, lanes - 1)
        okcol = (alive[:, None] & (idx2 < bound[:, None])
                 & (idx2 < lanes) & ctx.lane_valid[idx2c]
                 & ((offs[None, :] == 0) | ~ctx.first_of_seg[idx2c]))
        # chains stop at the first bad column (cumulative AND along f)
        ok = jnp.cumprod(okcol.astype(jnp.int32), axis=1).astype(bool)

        # one fused context gather for all phases (phase-major layout)
        gctx = gather_fn(idx2c.T.reshape(-1), ok.T.reshape(-1))
        prevh = jnp.clip(headc - 1, 0, lanes - 1)
        sp, sc, sz = p[prevh], c[prevh], z[prevh]
        if entry is not None:
            at0 = headc == 0
            sp = jnp.where(at0, entry[0], sp)
            sc = jnp.where(at0, entry[1], sc)
            sz = jnp.where(at0, entry[2], sz)
        changed = alive  # heads always re-decode (their pred changed)
        act_l, new_l, mark_l, ch_l = [], [], [], []
        for f in range(follow):
            idxf = idx2c[:, f]
            activef = ok[:, f] & changed
            cctx = _slice_ctx(gctx, f * width, (f + 1) * width, activef)
            p2, c2, z2, n2 = _decode_subseq_pass(cfg, arrs, cctx,
                                                 sp, sc, sz, activef)
            ch = activef & ((p2 != p[idxf]) | (c2 != c[idxf])
                            | (z2 != z[idxf]))
            act_l.append(activef)
            ch_l.append(ch)
            new_l.append((p2, c2, z2, n2))
            # the chain continues past this round only from a changed
            # column whose successor was NOT decoded as the next phase
            # (ran out of depth, or collided with the next chain's
            # stale-started head)
            nxt_dec = ok[:, f + 1] if f + 1 < follow else jnp.zeros_like(ch)
            mark_l.append(ch & ~nxt_dec)
            sp, sc, sz = p2, c2, z2
            changed = ch
        act = jnp.stack(act_l, axis=1)      # (width, follow)
        chs = jnp.stack(ch_l, axis=1)
        mark = jnp.stack(mark_l, axis=1)
        # one scatter per state array; decoded columns are disjoint, and
        # dropped columns get distinct out-of-bounds sentinels so the
        # unique-indices promise holds. p/c/z scatter only CHANGED columns
        # (an unchanged end state means the stored values are literally
        # equal — the write is a no-op; the frontier halves per round so
        # this halves the 8 ns/element scatter-back). n is written for
        # every decoded column: self-synchronization can change the
        # symbol count without changing the end state.
        upd_idx_n = jnp.where(act, idx2c, sentinel).reshape(-1)
        upd_idx_s = jnp.where(chs, idx2c, sentinel).reshape(-1)
        stk = lambda j: jnp.stack([t[j] for t in new_l], axis=1).reshape(-1)
        upd = lambda full, flat, idx: full.at[idx].set(
            flat, mode="drop", unique_indices=True)
        p = upd(p, stk(0), upd_idx_s)
        c = upd(c, stk(1), upd_idx_s)
        z = upd(z, stk(2), upd_idx_s)
        n = upd(n, stk(3), upd_idx_n)
        # next head = successor of the (single) marked column, kept only
        # if it is a real, non-segment-first lane
        cand = jnp.sum(jnp.where(mark, idx2 + 1, 0), axis=1)
        has = jnp.any(mark, axis=1)
        candc = jnp.clip(cand, 0, lanes - 1)
        keep = (has & (cand < lanes) & ctx.lane_valid[candc]
                & ~ctx.first_of_seg[candc])
        head = jnp.where(keep, cand, lanes)
        return p, c, z, n, head

    # Halving tier ladder (sync_tiers="ladder"): one compacted tier per
    # power-of-two width from K down to the tail, each typically one
    # round. The mis-synced frontier HALVES per round on real content
    # (BENCH.md syncdiag: 10345 -> 5222 -> 2648 -> ... of 24576), so a
    # ladder of halving widths keeps every round's pass proportional to
    # the actual frontier — where the classic 2-tier structure pays
    # full-width rounds down to 2048 and fixed-width rounds below. Only
    # viable with the cheap "rows" context gather (a per-round row take);
    # the ladder's top tiers gather 4-12k contexts per round.
    if _resolve_sync_tiers(cfg) == "ladder":
        frontier = jnp.roll(delta, 1) & frontier_ok
        head = jnp.nonzero(frontier, size=K,
                           fill_value=lanes)[0].astype(jnp.int32)
        widths = []
        w = K
        while w >= 128:
            widths.append(w)
            w //= 2
        widths.append(max(w, 32))
        it0p = it0
        for i, wd in enumerate(widths):
            nxt = widths[i + 1] if i + 1 < len(widths) else 0
            fw_i = Fw if wd > 512 else F

            def lbody(state, wd=wd, fw_i=fw_i):
                p, c, z, n, head, it = state
                p, c, z, n, head = compact_round(p, c, z, n, head, wd,
                                                 fw_i)
                return p, c, z, n, head, it + 1

            def lcond(state, nxt=nxt):
                head, it = state[4], state[5]
                live = jnp.sum((head < lanes).astype(jnp.int32))
                return (live > nxt) & (it < lanes)

            p, c, z, n, head, it0p = jax.lax.while_loop(
                lcond, lbody, (p, c, z, n, head, it0p))
            if nxt:
                # compact live heads to the next (halved) tier width: a
                # nonzero+take, not a sort — live heads are already in
                # ascending order (compact_round keeps them sorted), only
                # interleaved with dead `lanes` sentinels
                live_idx = jnp.nonzero(head < lanes, size=nxt,
                                       fill_value=wd)[0].astype(jnp.int32)
                head = jnp.where(live_idx < wd,
                                 jnp.take(head,
                                          jnp.clip(live_idx, 0, wd - 1)),
                                 lanes)
        if diag:
            return p, c, z, n, it0, it0p
        return p, c, z, n

    # Tier 1 (wide): ONE global compaction yields up to K chain heads;
    # each round advances its own heads locally — no full-width
    # nonzero/roll/delta scatters per round.
    frontier = jnp.roll(delta, 1) & frontier_ok
    head = jnp.nonzero(frontier, size=K,
                       fill_value=lanes)[0].astype(jnp.int32)

    if Kc < K:
        def wide_body(state):
            p, c, z, n, head, it = state
            p, c, z, n, head = compact_round(p, c, z, n, head, K, Fw)
            return p, c, z, n, head, it + 1

        def wide_cond(state):
            head, it = state[4], state[5]
            live = jnp.sum((head < lanes).astype(jnp.int32))
            return (live > Kc) & (it < lanes)

        p, c, z, n, head, it0 = jax.lax.while_loop(
            wide_cond, wide_body, (p, c, z, n, head, it0))
        # hand the surviving heads (<= Kc live by the loop condition) to
        # the narrow tier; dead `lanes` sentinels sort to the tail
        head = jnp.sort(head)[:Kc]

    # Tier 3 geometry (resolved here so tier 2's exit condition knows it):
    # once fewer than Kt chains survive, rounds shrink to the narrowest
    # width — the last chains of the decay (the 12 MP bench spends ~6
    # narrow rounds fixing <10 lanes each) drain at minimal per-round cost.
    Kt = cfg.tuning.tail_width or 64
    Ft = min(cfg.tuning.tail_follow or 4, max(Kt, 1))
    has_tail = Kt < Kc
    live_floor = Kt if has_tail else 0

    # Tier 2 (narrow): chain-follow rounds at head capacity Kc, depth F.
    def body(state):
        p, c, z, n, head, it = state
        p, c, z, n, head = compact_round(p, c, z, n, head, Kc, F)
        return p, c, z, n, head, it + 1

    def cond2(state):
        p, c, z, n, head, it = state
        live = jnp.sum((head < lanes).astype(jnp.int32))
        return (live > live_floor) & (it < lanes)

    state = (p, c, z, n, head, it0)
    p, c, z, n, head, it = jax.lax.while_loop(cond2, body, state)

    if has_tail:
        head = jnp.sort(head)[:Kt]

        def body_t(state):
            p, c, z, n, head, it = state
            p, c, z, n, head = compact_round(p, c, z, n, head, Kt, Ft)
            return p, c, z, n, head, it + 1

        def cond_t(state):
            p, c, z, n, head, it = state
            return jnp.any(head < lanes) & (it < lanes)

        p, c, z, n, _, it = jax.lax.while_loop(
            cond_t, body_t, (p, c, z, n, head, it))
    if diag:
        # (full + wide-tier rounds after round 1, total rounds)
        return p, c, z, n, it0, it
    return p, c, z, n


def symbol_offsets(cfg: ScanConfig, arrs: ScanArrays, n: jax.Array) -> jax.Array:
    """Per-subsequence exclusive prefix of symbol counts within its segment
    (the ExclusiveScanByKey of decode_huffman.cu:827-860)."""
    cum = jnp.cumsum(n)
    excl = cum - n
    base = jnp.take(excl, jnp.clip(arrs.seg_first_lane, 0, cfg.lanes - 1))
    return excl - base


def _make_write_round(cfg: ScanConfig, arrs: ScanArrays, cctx: _Ctx, bound,
                      total: int, chunk: int):
    """One writing-decode round: `chunk` symbol steps buffered per lane, then
    a single element-granular scatter into the coefficient stream."""
    natural = jnp.asarray(np.asarray(C.ORDER_NATURAL), jnp.int32)

    unroll = _resolve_unroll(cfg)

    def round_body(p, c, z, pos, active, out):
        def inner(k, istate):
            p, c, z, pos, active, wpos_buf, wval_buf = istate
            for u in range(unroll):
                alive = active & (pos < bound)
                p, c, z, sym, run, commit = _symbol_step(
                    cfg, arrs, cctx, p, c, z, alive)
                wpos = pos + run
                # clamp writes to the lane's segment bound so a corrupt
                # segment's final run cannot overrun into the next segment's
                # range (XLA leaves duplicate-index scatter winners
                # unspecified; golden clamps identically)
                do_write = commit & (sym != 0) & (wpos < bound)
                du = wpos // C.DATA_UNIT_SIZE
                iz = wpos % C.DATA_UNIT_SIZE
                # zig-zag -> natural via one-hot over the 64-entry table
                oh = np.arange(64, dtype=np.int32)[:, None] == iz[None, :]
                nat = jnp.sum(jnp.where(oh, natural[:, None], 0), axis=0)
                tgt = du * C.DATA_UNIT_SIZE + nat
                slot = k * unroll + u
                wpos_buf = wpos_buf.at[:, slot].set(
                    jnp.where(do_write, tgt, total))
                wval_buf = wval_buf.at[:, slot].set(
                    jnp.where(do_write, sym, 0).astype(jnp.int16))
                pos = jnp.where(commit, wpos + 1, pos)
                active = commit
            return p, c, z, pos, active, wpos_buf, wval_buf

        width = p.shape[0]
        wpos_buf = jnp.full((width, chunk), total, jnp.int32)
        wval_buf = jnp.zeros((width, chunk), jnp.int16)
        p, c, z, pos, active, wpos_buf, wval_buf = jax.lax.fori_loop(
            0, chunk // unroll, inner,
            (p, c, z, pos, active, wpos_buf, wval_buf))
        out = out.at[wpos_buf.reshape(-1)].set(
            wval_buf.reshape(-1), mode="drop", unique_indices=False)
        return p, c, z, pos, active, out

    return round_body


def write_start_states(ctx: _Ctx, p, c, z, entry=None):
    """Per-lane start states for the writing decode: lane i continues from
    lane i-1's synced end state; segment firsts restart from zero. With
    ``entry`` (subsequence-sharded decode), lane 0 of a shard that begins
    mid-segment starts from the previous shard's boundary state instead of
    the roll wrap."""
    sp = jnp.where(ctx.first_of_seg, 0, jnp.roll(p, 1))
    sc = jnp.where(ctx.first_of_seg, 0, jnp.roll(c, 1))
    sz = jnp.where(ctx.first_of_seg, 0, jnp.roll(z, 1))
    if entry is not None:
        use = ~ctx.first_of_seg[0]
        sp = sp.at[0].set(jnp.where(use, entry[0], sp[0]))
        sc = sc.at[0].set(jnp.where(use, entry[1], sc[0]))
        sz = sz.at[0].set(jnp.where(use, entry[2], sz[0]))
    return sp, sc, sz


def decode_write(cfg: ScanConfig, arrs: ScanArrays, ctx: _Ctx, p, c, z, n_off,
                 chunk: int | None = None, straggler_width: int | None = None,
                 pos_base=None, bound=None,
                 total_out: int | None = None, entry=None) -> jax.Array:
    """Final writing decode: re-decode every subsequence once from its synced
    start state, scattering nonzero coefficients zig-zag->natural into the
    stream-order coefficient buffer (decode_write, decode_huffman.cu:627-682).

    The scatter cost is proportional to emitted slots (lanes x chunk per
    round), so once few lanes remain active (symbol-count skew) they are
    compacted to `straggler_width` and finish on narrow rounds.

    Returns int16[total_positions].
    """
    if chunk is None:
        chunk = cfg.tuning.write_chunk
    if straggler_width is None:
        straggler_width = cfg.tuning.straggler_width
    lanes = cfg.lanes
    total = cfg.total_positions if total_out is None else total_out
    seg = arrs.seg_of_subseq
    seg_pos_base = seg * cfg.positions_per_seg if pos_base is None else pos_base
    # per-segment write bound, clamped to the real buffer size (the reference
    # leaves the last partial segment unclamped, decode_huffman.cu:318-319)
    if bound is None:
        bound_full = jnp.minimum((seg + 1) * cfg.positions_per_seg, total)
    else:
        bound_full = bound

    # start states: lane 0 of each segment decodes from scratch
    sp, sc, sz = write_start_states(ctx, p, c, z, entry)
    pos0 = seg_pos_base + n_off

    out = jnp.zeros(total + 1, jnp.int16)  # +1: slot `total` absorbs drops

    K = min(straggler_width, lanes)
    full_round = _make_write_round(cfg, arrs, ctx, bound_full, total, chunk)

    def cond_a(state):
        p, c, z, pos, active, out = state
        alive = active & (pos < bound_full)
        return jnp.sum(alive.astype(jnp.int32)) > K

    def body_a(state):
        return full_round(*state)

    active0 = ctx.lane_valid & (pos0 < bound_full) & (sp < ctx.end_subseq)
    state = (sp, sc, sz, pos0, active0, out)
    p, c, z, pos, active, out = jax.lax.while_loop(cond_a, body_a, state)

    out = scatter_finish(cfg, arrs, ctx, p, c, z, pos,
                         active & (pos < bound_full), bound_full, out,
                         total, chunk=chunk, width=K)
    return out[:total]


def scatter_finish(cfg: ScanConfig, arrs: ScanArrays, ctx: _Ctx, p, c, z,
                   pos, alive, bound_full, out, total: int, *,
                   chunk: int | None = None,
                   width: int | None = None) -> jax.Array:
    """Finish a partially-written decode on compacted narrow rounds.

    ``alive`` marks lanes with symbols left; their exact resume states are
    (p, c, z, pos). Used for the straggler tail of :func:`decode_write` and
    for the rare window-overflow lanes of the fused Pallas write kernel.
    ``out`` must carry the extra drop slot at index ``total``.
    """
    if chunk is None:
        chunk = cfg.tuning.write_chunk
    lanes = cfg.lanes
    K = min(width if width is not None else cfg.tuning.straggler_width, lanes)

    idx_raw = jnp.nonzero(alive, size=K, fill_value=-1)[0].astype(jnp.int32)
    valid = idx_raw >= 0
    idx = jnp.clip(idx_raw, 0, lanes - 1)
    cctx = gather_ctx(ctx, idx, valid)
    bound_c = bound_full[idx]
    comp_round = _make_write_round(cfg, arrs, cctx, bound_c, total, chunk)

    def cond_b(state):
        p, c, z, pos, active, out = state
        return jnp.any(active & (pos < bound_c))

    def body_b(state):
        return comp_round(*state)

    state_b = (p[idx], c[idx], z[idx], pos[idx], valid & alive[idx], out)
    _, _, _, _, _, out = jax.lax.while_loop(cond_b, body_b, state_b)
    return out


# --- dense-emission write path (TPU production default) ---------------------
#
# The element-granular scatter of decode_write costs XLA-TPU ~7ns per emitted
# slot — ~60ms on a 12MP image, by far the largest stage. This formulation
# splits the writing decode into:
#
#   1. emit: re-decode every subsequence once from its synced state, writing
#      each committed symbol's (position, value) *densely* at (slot, lane) —
#      pure row writes, no scatter (decode_write_emit);
#   2. assemble: turn the dense emission into (data_unit, 64) coefficient
#      tiles with batched one-hot matmuls on the MXU, then place whole tiles
#      with a windowed scatter-add — cutting scatter indices by ~64 x
#      (assemble_coefficients).
#
# Correct because lane position ranges are disjoint by construction (positions
# strictly increase within a lane; lane l writes exactly [pos0_l, pos0_l+m_l)
# clamped to its segment bound), so add == set, and zero values are no-ops.
# The reference scatters from shared memory per thread block instead
# (decode_huffman.cu:627-682) — a GPU-shape with no TPU analog.

# symbols per assembly round; any 64-coefficient data unit consumes >= 2
# symbols (its DC symbol + at least one AC symbol before the zig-zag index
# can wrap), so _ASM_R consecutive symbols of one lane touch at most
# _ASM_R // 2 + 1 data units
_ASM_R = 128
_ASM_D = 72  # du-window rows per assembly tile (>= _ASM_R // 2 + 1)


def _emit_cap(chunk: int) -> int:
    """Static bound on emission slots per subsequence: one per bit of the
    1024-bit subsequence, plus the <=31-bit overhang a lane can inherit when
    its predecessor stopped short of the boundary, inflated by the rolling
    bit-buffer's worst-case stall rate (a stalled iteration commits >= 7 of
    its 8 slots, see _BUF_W); rounded to whole chunks."""
    cap = C.SUBSEQ_SIZE_BITS + 32
    cap = -(-cap * 8 // 7)
    return -(-cap // chunk) * chunk


_REC_INERT = 0xFFFF  # packed record of an inert slot: value 0, local pos -1


def pack_record(val, wl):
    """Pack one emitted symbol as ``(val << 16) | (local_pos & 0xFFFF)``.

    Both halves are int16-exact: |val| <= 32767 (<= 15 magnitude bits) and
    the lane-local position wl = wp - pos0 is bounded by s_cap commits of
    <= 16 positions each (< 2^15); inert slots carry wl = -1."""
    return (val << 16) | (wl & 0xFFFF)


def unpack_record(rec):
    """Packed records -> (val, local_pos), both int32 (arithmetic shifts
    sign-extend each half)."""
    return rec >> 16, (rec << 16) >> 16


def decode_write_emit(cfg: ScanConfig, arrs: ScanArrays, ctx: _Ctx, p, c, z,
                      n_off, pos_base=None, bound=None,
                      total_out: int | None = None, entry=None):
    """Writing decode, dense-emission form.

    Returns ``(rec, m)``: ``rec[s, l]`` packs the value and LANE-LOCAL
    output position of the symbol committed at lane ``l``'s slot ``s`` as
    ``(val << 16) | ((wp - pos0[l]) & 0xFFFF)`` (see :func:`pack_record`;
    val 0 for non-writing symbols or positions clamped by the segment
    bound; local position -1 on inert slots — slots past the lane's last
    commit, and the rare in-between holes left by rolling-buffer stalls),
    and ``m[l]`` one past the lane's last committed slot. ``pos0[l]`` is
    the lane's first output position (``seg_pos_base + n_off``), which
    callers recompute from the same inputs. Consumers must treat a slot as
    real only if ``s < m & local_pos >= 0``; committed slots remain in
    stream order. Packing halves the emission buffer's HBM footprint —
    the dominant write-path traffic at merged-lane batch widths.
    """
    lanes = cfg.lanes
    chunk = cfg.tuning.write_chunk
    unroll = _resolve_unroll(cfg)
    assert chunk % unroll == 0, "write_chunk must be a multiple of unroll"
    s_cap = _emit_cap(chunk)
    total = cfg.total_positions if total_out is None else total_out
    seg = arrs.seg_of_subseq
    seg_pos_base = seg * cfg.positions_per_seg if pos_base is None else pos_base
    if bound is None:
        bound_full = jnp.minimum((seg + 1) * cfg.positions_per_seg, total)
    else:
        bound_full = bound

    sp, sc, sz = write_start_states(ctx, p, c, z, entry)
    pos0 = seg_pos_base + n_off

    if _resolve_entropy_backend(cfg) == "pallas":
        from . import huffman_pallas

        return huffman_pallas.emit_pass(
            cfg, arrs, ctx, sp, sc, sz, pos0, bound_full, ctx.lane_valid,
            s_cap)

    rec = jnp.full((s_cap, lanes), _REC_INERT, jnp.int32)
    m0 = jnp.zeros(lanes, jnp.int32)

    def round_body(state):
        p, c, z, pos, active, m, rec, k = state

        def inner(k2, istate):
            p, c, z, pos, active, m, rbuf = istate
            buf, base = _refill_buf(cfg, ctx, p)
            for u in range(unroll):
                data, stall = _load32_buf(ctx, p, buf, base)
                length, sym, run = _decode_symbol(cfg, arrs, ctx, data, c, z)
                ok = active & (pos < bound_full) & ~stall
                fits = p + length <= ctx.end_subseq
                commit = ok & fits
                # real end: crossed the subsequence or ran out of positions;
                # stalled lanes stay active and retry after the next refill
                active = active & ~(ok & ~fits) & (pos < bound_full)
                wp = pos + run
                emit_val = jnp.where(commit & (wp < bound_full), sym, 0)
                slot = k2 * unroll + u
                rbuf = rbuf.at[slot].set(jnp.where(
                    commit, pack_record(emit_val, wp - pos0),
                    _REC_INERT))
                p = jnp.where(commit, p + length, p)
                z_new = z + run + 1
                wrap = z_new >= 64
                c_new = jnp.where(wrap, c + 1, c)
                c_new = jnp.where(c_new >= cfg.du_per_mcu, 0, c_new)
                z = jnp.where(commit, jnp.where(wrap, 0, z_new), z)
                c = jnp.where(commit, c_new, c)
                pos = jnp.where(commit, wp + 1, pos)
                m = jnp.where(commit, k * chunk + slot + 1, m)
            return p, c, z, pos, active, m, rbuf

        rbuf = jnp.full((chunk, lanes), _REC_INERT, jnp.int32)
        p, c, z, pos, active, m, rbuf = jax.lax.fori_loop(
            0, chunk // unroll, inner, (p, c, z, pos, active, m, rbuf))
        rec = jax.lax.dynamic_update_slice(rec, rbuf, (k * chunk, 0))
        return p, c, z, pos, active, m, rec, k + 1

    def cond(state):
        p, c, z, pos, active, m, _, k = state
        return jnp.any(active & (pos < bound_full)) & (k < s_cap // chunk)

    active0 = ctx.lane_valid & (pos0 < bound_full) & (sp < ctx.end_subseq)
    state = (sp, sc, sz, pos0, active0, m0, rec, jnp.int32(0))
    _, _, _, _, _, m, rec, _ = jax.lax.while_loop(cond, round_body, state)
    return rec, m


def assemble_coefficients(val: jax.Array, wpos: jax.Array, m: jax.Array,
                          total: int) -> jax.Array:
    """Dense emission -> stream-order coefficients via MXU tile assembly.

    Per round, each lane's next _ASM_R symbols become a (_ASM_D, 64) data-unit
    tile by two one-hot products contracted on the MXU, and the tiles land in
    the output with ONE windowed scatter-add per lane (64-wide rows), instead
    of one scatter index per symbol slot.
    """
    s_cap, lanes = val.shape
    assert total % C.DATA_UNIT_SIZE == 0
    n_du = total // C.DATA_UNIT_SIZE
    # zig-zag index of each natural position: nat(iz) == zz  <=>  iz == inv[zz]
    inv_natural = np.argsort(np.asarray(C.ORDER_NATURAL)).astype(np.int32)
    inv_nat = jnp.asarray(inv_natural)
    iota_d = jnp.arange(_ASM_D, dtype=jnp.int32)

    out = jnp.zeros((n_du + _ASM_D, C.DATA_UNIT_SIZE), jnp.int16)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,))

    num_rounds = jnp.minimum(-(-jnp.max(m) // _ASM_R), s_cap // _ASM_R)

    def round_body(state):
        out, r = state
        w = jax.lax.dynamic_slice(wpos, (r * _ASM_R, 0), (_ASM_R, lanes))
        v = jax.lax.dynamic_slice(val, (r * _ASM_R, 0), (_ASM_R, lanes))
        # slot s of lane l is real iff s < m[l] and not a stall hole
        # (holes carry wpos -1 / val 0, so they are inert in B either way)
        s_idx = r * _ASM_R + jnp.arange(_ASM_R, dtype=jnp.int32)
        valid = (s_idx[:, None] < m[None, :]) & (w >= 0)
        w = jnp.maximum(w, 0)  # inert slots may carry garbage positions
        du = w >> 6
        iz = w & 63
        # slot 0 of a round is refill-aligned (unroll divides _ASM_R), so it
        # is never a stall hole: inert here means the lane has finished
        du0 = jnp.where(valid[0], du[0], n_du)  # sentinel: zero-padded rows
        d_local = jnp.clip(du - du0[None, :], 0, _ASM_D - 1)
        # A[r_, l, d] one-hot of the symbol's local data unit
        a = (d_local[:, :, None] == iota_d[None, None, :]) & valid[:, :, None]
        # B[r_, l, zz] = value placed at its natural position within the du
        b = jnp.where((iz[:, :, None] == inv_nat[None, None, :])
                      & valid[:, :, None],
                      v[:, :, None].astype(jnp.float32), 0.0)
        tiles = jnp.einsum("rld,rlz->ldz", a.astype(jnp.float32), b,
                           preferred_element_type=jnp.float32)
        out = jax.lax.scatter_add(
            out, du0[:, None], tiles.astype(jnp.int16), dnums,
            indices_are_sorted=False, unique_indices=False,
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP)
        return out, r + 1

    out, _ = jax.lax.while_loop(lambda s: s[1] < num_rounds, round_body,
                                (out, jnp.int32(0)))
    return out[:n_du].reshape(-1)


def _resolve_write_mode(cfg: ScanConfig) -> str:
    """Coefficient materialization mode. Measured on TPU v5e
    (scripts/stagebench.py, scripts/scatterbench.py): the all-XLA matmul
    assembly materializes its one-hot operands in HBM (~2 GB/round) and the
    element scatter costs ~7 ns/slot, so auto selects the Pallas
    tile-assembly path (ops/write_pallas.py) on TPU and the scatter on CPU
    backends (where XLA scatter is cheap and Pallas runs interpreted)."""
    mode = cfg.tuning.write_mode
    if mode == "auto":
        return "scatter" if jax.default_backend() == "cpu" else "tiles"
    return mode


def decode_scan(cfg: ScanConfig, arrs: ScanArrays, *, num_subseq=None,
                pos_base=None, bound=None,
                total_out: int | None = None, return_dc: bool = False):
    """Full entropy decode of one scan: sync, offsets, write.

    Returns int16[total_positions] stream-order coefficients (natural order
    within each data unit, DC still difference-coded). The keyword overrides
    support shard-local decode (see parallel/segments.py). With
    ``return_dc`` returns ``(coeffs, dc)`` where ``dc`` is the
    per-data-unit difference-coded DC side vector (``None`` when the
    active write mode has no cheap side output).
    """
    # named scopes tag the stages in HLO metadata so jax.profiler traces
    # (debug.profile_trace / bench.py --profile) attribute device time to
    # decode stages by name
    with jax.named_scope("jpeggpu.sync"):
        ctx = make_ctx(cfg, arrs, num_subseq=num_subseq)
        p, c, z, n = sync_states(cfg, arrs, ctx)
        n_off = symbol_offsets(cfg, arrs, n)
    return decode_scan_from_states(cfg, arrs, ctx, p, c, z, n_off,
                                   pos_base=pos_base, bound=bound,
                                   total_out=total_out, return_dc=return_dc)


def decode_scan_from_states(cfg: ScanConfig, arrs: ScanArrays, ctx: _Ctx,
                            p, c, z, n_off, *, pos_base=None, bound=None,
                            total_out: int | None = None,
                            entry=None, return_dc: bool = False):
    """Writing decode from already-synced states: the write-stage dispatch
    of :func:`decode_scan`, callable with externally converged (p, c, z)
    and symbol offsets (subsequence-sharded decode syncs across shards
    first; parallel/segments.py). ``entry`` is the cross-shard boundary
    start state for a lane 0 that begins mid-segment."""
    mode = _resolve_write_mode(cfg)
    with jax.named_scope(f"jpeggpu.write.{mode}"):
        if mode == "tiles":
            from . import write_pallas

            return write_pallas.decode_write_tiles(
                cfg, arrs, ctx, p, c, z, n_off, pos_base=pos_base,
                bound=bound, total_out=total_out, entry=entry,
                return_dc=return_dc)
        if mode == "fused":
            from . import huffman_pallas

            coeffs = huffman_pallas.decode_write_fused(
                cfg, arrs, ctx, p, c, z, n_off, pos_base=pos_base,
                bound=bound, total_out=total_out, entry=entry)
        elif mode == "matmul":
            total = cfg.total_positions if total_out is None else total_out
            rec, m = decode_write_emit(
                cfg, arrs, ctx, p, c, z, n_off, pos_base=pos_base,
                bound=bound, total_out=total_out, entry=entry)
            seg_pos_base = (arrs.seg_of_subseq * cfg.positions_per_seg
                            if pos_base is None else pos_base)
            v32, wl = unpack_record(rec)
            wpos = jnp.where(wl >= 0, wl + (seg_pos_base + n_off)[None, :],
                             -1)
            coeffs = assemble_coefficients(v32.astype(jnp.int16), wpos, m,
                                           total)
        else:
            coeffs = decode_write(cfg, arrs, ctx, p, c, z, n_off,
                                  pos_base=pos_base, bound=bound,
                                  total_out=total_out, entry=entry)
    return (coeffs, None) if return_dc else coeffs
