"""Segment/subsequence-sharded single-image decode: sequence parallelism.

Restart-interval segments are fully independent decode units (bit position,
DC prediction and MCU count all reset at each marker — reader.hpp:34-43), so
one large image can be decoded across a device mesh by giving each device a
contiguous group of segments. This is the TPU-native answer to BASELINE
config 2 ("restart-segment-parallel Huffman decode") and the scaling axis the
single-GPU reference lacks.

Mechanics (segment granularity, scans with >= num_devices segments):
- the host partitions segments into one contiguous group per device,
  balancing subsequence counts, and rebases each group's subsequence,
  segment and output-position indexing to be shard-local;
- a `shard_map` over the mesh runs the standard decode on each shard (the
  per-lane bound/base arrays carry the shard-local geometry, so the SPMD
  program is uniform);
- shard coefficient slices merge by reduce_scatter into MCU-row-aligned
  chunks (positions of consecutive segment groups are contiguous and the
  supports are disjoint, so the "ordered gather" IS the reduce) — no device
  ever materializes a replicated full-size stream;
- DC un-delta / de-interleave / IDCT run on each shard's own row chunk
  (the only cross-chunk coupling is the DC predictor of a segment that
  straddles a chunk seam — one all_gather of per-component partial sums),
  and the planes return row-sharded.

Scans with fewer segments than devices (ultimately: one giant no-restart
segment) shard at SUBSEQUENCE granularity instead — the associative-scan
recast of SURVEY §5. The decoder state after subsequence i — (p, c, z):
bit position, data-unit-in-MCU, zig-zag index — is *segment-relative*, so
it transfers between shards unchanged:
- each shard runs the standard intra-shard Jacobi self-sync, its first
  lane seeded from an `entry` boundary state (blind on the first pass);
- an outer fixed point exchanges each shard's last-lane exit state to its
  successor (`ppermute`) and re-syncs until no entry changes (`psum`
  convergence flag). Self-sync makes exit states almost always correct
  after the first local pass, so this converges in 2 outer rounds for
  real streams (worst case: one round per shard);
- symbol offsets cross shard seams via one `all_gather` of per-shard
  (head segment, tail segment, tail symbol count) triples: a shard's
  head-partial segment inherits the summed counts of its predecessors;
- every shard writes its records at global positions into a full-size
  coefficient buffer (disjoint supports) and a `psum` merges them — at
  int16 coefficient sizes this is a few MB over ICI.

Multi-scan images shard scan-by-scan: each scan independently picks
segment or subsequence granularity; tails run on the gathered streams.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import constants as C
from ..ops.huffman import ScanArrays, ScanConfig, decode_scan
from ..ops.idct import dequant_idct_plane
from ..ops.transpose import deinterleave
from ..pipeline import DecodePlan, _bucket, _destuff_host, build_plan, pack_huff_tables
from ..reader import num_mcus_in_segment, parse
from ..errors import NotSupported


@dataclasses.dataclass(frozen=True)
class ShardPlanStatic:
    cfg: ScanConfig  # uniform per-shard config (lanes = padded shard width)
    shard_positions: int  # padded per-shard output length
    num_segments_padded: int
    real_positions: Tuple[int, ...]  # per shard, for trimming
    num_shards: int
    bounds: Tuple[int, ...]  # segment partition boundaries (host-side)


def plan_shards(plan: DecodePlan, num_shards: int,
                si: int = 0) -> ShardPlanStatic:
    stream = plan.stream
    scan = stream.scans[si]
    if scan.num_segments < num_shards:
        raise NotSupported(
            f"scan has {scan.num_segments} restart segments; need >= "
            f"{num_shards} for segment-granular sharding (subsequence "
            f"sharding handles this case)")
    counts = scan.segments[:, 1].astype(np.int64)
    # contiguous partition balancing subsequence counts
    target = counts.sum() / num_shards
    bounds = [0]
    acc = 0
    for s, c in enumerate(counts):
        acc += int(c)
        if acc >= target * len(bounds) and len(bounds) < num_shards:
            bounds.append(s + 1)
    while len(bounds) < num_shards + 1:
        bounds.append(scan.num_segments)
    bounds = bounds[:num_shards] + [scan.num_segments]
    # every shard must own at least one segment
    for i in range(1, num_shards + 1):
        lo = max(bounds[i], bounds[i - 1] + 1)
        bounds[i] = min(lo, scan.num_segments - (num_shards - i))
    bounds[num_shards] = scan.num_segments

    pps = num_mcus_in_segment(stream, scan) * scan.num_data_units_in_mcu * \
        C.DATA_UNIT_SIZE
    total = scan.total_data_units * C.DATA_UNIT_SIZE
    lanes = _bucket(max(
        int(counts[bounds[d]:bounds[d + 1]].sum()) for d in range(num_shards)))
    nseg_p = _bucket(max(
        bounds[d + 1] - bounds[d] for d in range(num_shards)), 64)
    real_pos = []
    for d in range(num_shards):
        lo = bounds[d] * pps
        hi = min(bounds[d + 1] * pps, total)
        real_pos.append(max(hi - lo, 0))
    shard_positions = -(-max(real_pos) // 128) * 128

    sp = plan.signature.scans[si]
    cfg = ScanConfig(
        num_subseq=lanes,  # per-shard actual count is a traced input
        lanes=lanes,
        num_segments=nseg_p,
        du_per_mcu=sp.cfg.du_per_mcu,
        mcus_per_seg=sp.cfg.mcus_per_seg,
        total_mcus=sp.cfg.total_mcus,
        comp_groups=sp.cfg.comp_groups,
        fast_tables=sp.cfg.fast_tables,
    )
    return ShardPlanStatic(cfg=cfg, shard_positions=shard_positions,
                           num_segments_padded=nseg_p,
                           real_positions=tuple(real_pos),
                           num_shards=num_shards, bounds=tuple(bounds))


def build_shard_inputs(data: bytes, plan: DecodePlan,
                       shp: ShardPlanStatic, si: int = 0) -> dict:
    """Host staging: per-shard words/segment arrays, stacked on a leading
    shard axis (tables replicated)."""
    stream = plan.stream
    scan = stream.scans[si]
    buf = np.frombuffer(data, np.uint8)
    words_full = _destuff_host(buf, scan, _bucket(scan.num_subsequences))
    bounds = shp.bounds
    pps = shp.cfg.positions_per_seg
    total = shp.cfg.total_positions
    D = shp.num_shards
    L = shp.cfg.lanes

    words = np.zeros((D, L * C.CHUNK_SIZE_WORDS), np.uint32)
    seg_of = np.zeros((D, L), np.int32)
    seg_first = np.zeros((D, L), np.int32)
    seg_nsub = np.zeros((D, L), np.int32)
    pos_base = np.zeros((D, L), np.int32)
    pos_bound = np.zeros((D, L), np.int32)
    n_subseq = np.zeros((D, 1), np.int32)
    for d in range(D):
        lo, hi = bounds[d], bounds[d + 1]
        segs = scan.segments[lo:hi]
        first_sub = int(segs[0, 0])
        n_sub = int(segs[:, 1].sum())
        n_subseq[d, 0] = n_sub
        w0 = first_sub * C.CHUNK_SIZE_WORDS
        words[d, :n_sub * C.CHUNK_SIZE_WORDS] = \
            words_full[w0:w0 + n_sub * C.CHUNK_SIZE_WORDS]
        local_ids = np.repeat(np.arange(hi - lo, dtype=np.int32), segs[:, 1])
        seg_of[d, :n_sub] = local_ids
        seg_first[d, :n_sub] = segs[local_ids, 0] - first_sub
        seg_nsub[d, :n_sub] = segs[local_ids, 1]
        if n_sub < L and len(segs):
            seg_of[d, n_sub:] = hi - lo - 1
            seg_first[d, n_sub:] = segs[-1, 0] - first_sub
            seg_nsub[d, n_sub:] = segs[-1, 1]
        shard_lo = lo * pps
        base = (local_ids + lo) * pps - shard_lo
        bnd = np.minimum((local_ids + lo + 1) * pps, total) - shard_lo
        pos_base[d, :n_sub] = base
        pos_bound[d, :n_sub] = np.clip(bnd, 0, shp.shard_positions)

    maxcode, vsm, huffval = pack_huff_tables(scan)
    return dict(words=words, seg_of=seg_of, seg_first=seg_first,
                seg_nsub=seg_nsub, pos_base=pos_base, pos_bound=pos_bound,
                n_subseq=n_subseq,
                maxcode=maxcode, vsm=vsm, huffval=huffval)


# --- sharded tail ------------------------------------------------------------
#
# The tail stages (DC un-delta, de-interleave, IDCT) partition cleanly by
# MCU ROWS: a chunk of whole MCU rows is a contiguous coefficient range, its
# de-interleaved pixels are a contiguous plane row block, and the only
# cross-chunk coupling is the DC predictor of a segment that straddles a
# chunk boundary — one scalar per scan component per shard, resolved by the
# same one-all_gather seam pattern as the symbol offsets. The coefficient
# merge is therefore a reduce_scatter (psum_scatter) into row-aligned
# chunks, NOT a psum: no shard ever materializes a replicated full-size
# stream, each runs its own tail, and the planes come back row-sharded.


def _chunk_rows(num_mcus_y: int, D: int) -> int:
    return -(-num_mcus_y // D)


def _undelta_dc_chunk(cfg: ScanConfig, comp_slots, chunk, me, axis: str,
                      D: int):
    """DC un-delta on one MCU-row-aligned coefficient chunk.

    Identical arithmetic to ops.dc.undelta_dc (int32 cumsum, one int16 wrap
    at the end) with the segment prefix split at chunk seams: a segment that
    began in an earlier chunk contributes its partial sum via one
    all_gather of per-component tail sums."""
    chunk_du = chunk.shape[0] // C.DATA_UNIT_SIZE
    arr = chunk.reshape(chunk_du, C.DATA_UNIT_SIZE)
    dc = arr[:, 0].astype(jnp.int32)
    d0 = me * chunk_du
    dloc = jnp.arange(chunk_du, dtype=jnp.int32)
    slot = (d0 + dloc) % cfg.du_per_mcu
    seg_du = cfg.mcus_per_seg * cfg.du_per_mcu
    gseg = (d0 + dloc) // seg_du
    head_seg = d0 // seg_du
    last_seg = (d0 + chunk_du - 1) // seg_du

    per_comp = []
    tails = []
    for off, cnt in comp_slots:
        sel = (slot >= off) & (slot < off + cnt)
        x = jnp.where(sel, dc, 0)
        cum = jnp.cumsum(x)
        per_comp.append((sel, cum))
        # this chunk's contribution to its (possibly continuing) last segment
        tails.append(jnp.sum(jnp.where(gseg == last_seg, x, 0)))
    g = jax.lax.all_gather(jnp.stack(tails), axis)  # (D, ncomp)
    eidx = jnp.arange(D, dtype=jnp.int32)
    last_seg_all = ((eidx + 1) * chunk_du - 1) // seg_du

    new_dc = dc
    crosses_in = head_seg * seg_du < d0  # head segment began in a prior chunk
    for ci, (sel, cum) in enumerate(per_comp):
        # sum of this component's deltas over the head segment's earlier
        # chunks: every predecessor whose last segment IS our head segment
        # (a segment spanning k chunks chains through k-1 such tails)
        prefix = jnp.sum(jnp.where((eidx < me) & (last_seg_all == head_seg),
                                   g[:, ci], 0))
        seg_start_loc = gseg * seg_du - d0
        base_local = jnp.where(
            seg_start_loc > 0,
            jnp.take(cum, jnp.clip(seg_start_loc - 1, 0, chunk_du - 1)), 0)
        in_head = (gseg == head_seg) & crosses_in
        val = jnp.where(in_head, cum + prefix, cum - base_local)
        new_dc = jnp.where(sel, val, new_dc)
    wrapped = ((new_dc + 0x8000) & 0xFFFF) - 0x8000
    return arr.at[:, 0].set(wrapped.astype(jnp.int16)).reshape(-1)


def _tail_chunk(cfg: ScanConfig, sp, with_idct: bool, axis: str, D: int,
                rows: int, coeffs_padded, qtables):
    """Reduce-scatter the (disjoint-support) per-shard coefficient buffers
    into MCU-row chunks and run DC/de-interleave/IDCT shard-locally.
    Returns one row block per scan component (pixel rows if with_idct)."""
    chunk = jax.lax.psum_scatter(coeffs_padded, axis, scatter_dimension=0,
                                 tiled=True)
    me = jax.lax.axis_index(axis).astype(jnp.int32)
    comp_slots = tuple((c0[1], c0[2] * c0[3]) for c0 in sp.comps)
    with jax.named_scope("jpeggpu.dc"):
        chunk = _undelta_dc_chunk(cfg, comp_slots, chunk, me, axis, D)
    t_comps = [(c0[1], c0[2], c0[3], 0) for c0 in sp.comps]
    with jax.named_scope("jpeggpu.deinterleave"):
        planes = deinterleave(cfg, chunk, sp.num_mcus_x, rows, t_comps)
    if with_idct:
        with jax.named_scope("jpeggpu.idct"):
            planes = [dequant_idct_plane(p, qtables[c0[6]])
                      for p, c0 in zip(planes, sp.comps)]
    return tuple(planes)


def _shard_decode(shp: ShardPlanStatic, sp, with_idct: bool, axis: str,
                  rows: int, padded_total: int, words, seg_of, seg_first,
                  seg_nsub, pos_base, pos_bound, n_subseq, lo_pos, qtables,
                  maxcode, vsm, huffval):
    # shard_map passes per-device blocks with a leading axis of size 1
    arrs = ScanArrays(words=words[0], seg_of_subseq=seg_of[0],
                      seg_first_lane=seg_first[0], seg_num_subseq=seg_nsub[0],
                      maxcode=maxcode, vsm=vsm, huffval=huffval)
    coeffs = decode_scan(shp.cfg, arrs, num_subseq=n_subseq[0, 0],
                         pos_base=pos_base[0], bound=pos_bound[0],
                         total_out=shp.shard_positions)
    # embed the shard-local slice into the row-padded global frame; the
    # supports stay disjoint, so the reduce_scatter of _tail_chunk is the
    # ordered gather — restricted to each shard's own row chunk
    me = jax.lax.axis_index(axis).astype(jnp.int32)
    # the embed buffer carries shard_positions of slack so no shard's
    # (zero-padded) slice is shifted by dynamic_update_slice's start clamp;
    # real positions all sit below padded_total, so the trim only drops
    # padding zeros
    frame = jnp.zeros(padded_total + shp.shard_positions, jnp.int16)
    frame = jax.lax.dynamic_update_slice(frame, coeffs,
                                         (jnp.take(lo_pos, me),))
    return _tail_chunk(shp.cfg, sp, with_idct, axis, shp.num_shards, rows,
                       frame[:padded_total], qtables)


def _decode_scan_segments(data: bytes, plan: DecodePlan, si: int, mesh: Mesh,
                          with_idct: bool):
    """Per-component plane row blocks of scan `si`, sharded at segment
    granularity (tail included: planes return row-sharded)."""
    D = mesh.devices.size
    shp = plan_shards(plan, D, si)
    inputs = build_shard_inputs(data, plan, shp, si)
    axis = mesh.axis_names[0]
    sp = plan.signature.scans[si]
    cfg = shp.cfg
    rows = _chunk_rows(sp.num_mcus_y, D)
    row_pos = sp.num_mcus_x * cfg.du_per_mcu * C.DATA_UNIT_SIZE
    padded_total = D * rows * row_pos
    lo_pos = np.asarray([b * cfg.positions_per_seg for b in shp.bounds[:D]],
                        np.int32)

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    dev_in = {k: jax.device_put(
        v, shard if k not in ("maxcode", "vsm", "huffval") else repl)
        for k, v in inputs.items()}
    dev_in["lo_pos"] = jax.device_put(lo_pos, repl)
    dev_in["qtables"] = jax.device_put(
        plan.stream.qtables.astype(np.int32), repl)

    from jax import shard_map

    f = shard_map(
        partial(_shard_decode, shp, sp, with_idct, axis, rows, padded_total),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(), P(), P(), P(), P()),
        out_specs=tuple(P(axis) for _ in sp.comps),
        check_vma=False,
    )
    return jax.jit(lambda i: f(
        i["words"], i["seg_of"], i["seg_first"], i["seg_nsub"],
        i["pos_base"], i["pos_bound"], i["n_subseq"], i["lo_pos"],
        i["qtables"], i["maxcode"], i["vsm"], i["huffval"]))(dev_in)


# --- subsequence-granular sharding (no-restart / few-segment scans) ---------

@dataclasses.dataclass(frozen=True)
class SubseqShardStatic:
    cfg: ScanConfig  # per-shard config (lanes = padded shard width)
    num_shards: int
    bounds: Tuple[int, ...]  # subsequence partition boundaries (global)


def plan_subseq_shards(plan: DecodePlan, num_shards: int,
                       si: int = 0) -> SubseqShardStatic:
    scan = plan.stream.scans[si]
    n = scan.num_subsequences
    if n < num_shards:
        raise NotSupported(
            f"scan has {n} subsequences; need >= {num_shards} to shard "
            f"across the mesh")
    bounds = [d * n // num_shards for d in range(num_shards)] + [n]
    width = max(bounds[d + 1] - bounds[d] for d in range(num_shards))
    # +1: the slot after the last real lane holds a copy of the next
    # shard's first chunk, so the final lane's straddle word (the window's
    # next_first roll) reads true stream bytes
    lanes = _bucket(width + 1)
    sp = plan.signature.scans[si]
    cfg = dataclasses.replace(sp.cfg, num_subseq=lanes, lanes=lanes)
    return SubseqShardStatic(cfg=cfg, num_shards=num_shards,
                             bounds=tuple(bounds))


def build_subseq_shard_inputs(data: bytes, plan: DecodePlan,
                              shp: SubseqShardStatic, si: int = 0) -> dict:
    """Host staging for subsequence-granular shards.

    Segment tables keep their TRUE geometry in shard-local lane indexing:
    a segment that starts in an earlier shard gets a negative
    seg_first_lane, so rel/blind positions stay segment-relative and the
    boundary state transfers between shards unchanged."""
    stream = plan.stream
    scan = stream.scans[si]
    buf = np.frombuffer(data, np.uint8)
    n = scan.num_subsequences
    words_full = _destuff_host(buf, scan, _bucket(n + 1))
    D, L = shp.num_shards, shp.cfg.lanes
    CW = C.CHUNK_SIZE_WORDS
    counts = scan.segments[:, 1].astype(np.int64)
    seg_of_global = np.repeat(
        np.arange(scan.num_segments, dtype=np.int32), counts)

    words = np.zeros((D, L * CW), np.uint32)
    seg_first = np.zeros((D, L), np.int32)
    seg_nsub = np.zeros((D, L), np.int32)
    seg_local = np.zeros((D, L), np.int32)
    seg_global = np.zeros((D, L), np.int32)
    prev_word = np.zeros((D, 1), np.uint32)
    n_subseq = np.zeros((D, 1), np.int32)
    for d in range(D):
        lo, hi = shp.bounds[d], shp.bounds[d + 1]
        nd = hi - lo
        n_subseq[d, 0] = nd
        words[d, :(nd + 1) * CW] = words_full[lo * CW:(hi + 1) * CW]
        if lo > 0:
            prev_word[d, 0] = words_full[lo * CW - 1]
        gseg = seg_of_global[lo:hi]
        seg_global[d, :nd] = gseg
        seg_local[d, :nd] = gseg - gseg[0]
        seg_first[d, :nd] = scan.segments[gseg, 0].astype(np.int32) - lo
        seg_nsub[d, :nd] = scan.segments[gseg, 1]
        if nd < L:  # padded lanes: inert (num_subseq masks them)
            seg_global[d, nd:] = seg_global[d, nd - 1]
            seg_local[d, nd:] = seg_local[d, nd - 1]
            seg_first[d, nd:] = seg_first[d, nd - 1]
            seg_nsub[d, nd:] = seg_nsub[d, nd - 1]

    maxcode, vsm, huffval = pack_huff_tables(scan)
    return dict(words=words, seg_of=seg_local, seg_first=seg_first,
                seg_nsub=seg_nsub, seg_global=seg_global,
                prev_word=prev_word, n_subseq=n_subseq,
                maxcode=maxcode, vsm=vsm, huffval=huffval)


def _subseq_shard_decode(shp: SubseqShardStatic, sp, with_idct: bool,
                         axis: str, rows: int, padded_total: int, words,
                         seg_of, seg_first, seg_nsub, seg_global, prev_word,
                         n_subseq, qtables, maxcode, vsm, huffval):
    from ..ops import huffman as H

    cfg = shp.cfg
    D = shp.num_shards
    arrs = ScanArrays(words=words[0], seg_of_subseq=seg_of[0],
                      seg_first_lane=seg_first[0],
                      seg_num_subseq=seg_nsub[0],
                      maxcode=maxcode, vsm=vsm, huffval=huffval)
    nsub = n_subseq[0, 0]
    ctx = H.make_ctx(cfg, arrs, num_subseq=nsub)
    # lane 0's window row 0 (the roll wraps to the shard's own last lane)
    # must be the true word before the shard for the boundary straddle
    ctx = dataclasses.replace(
        ctx, window=ctx.window.at[0, 0].set(prev_word[0, 0]))
    last = nsub - 1
    perm = [(i, i + 1) for i in range(D - 1)]

    def sync_once(entry):
        p, c, z, n = H.sync_states(cfg, arrs, ctx,
                                   entry=(entry[0], entry[1], entry[2]))
        ex = jnp.stack([jnp.take(p, last), jnp.take(c, last),
                        jnp.take(z, last)])
        ne = jax.lax.ppermute(ex, axis, perm) if D > 1 else ex
        return p, c, z, n, ne

    # outer fixed point: re-sync with the incoming boundary state until no
    # shard's entry changes (shard 0's incoming stays the zero state, which
    # equals its blind start — and its lane 0 is the scan start anyway)
    entry0 = jnp.stack([ctx.rel[0] * C.SUBSEQ_SIZE_BITS, jnp.int32(0),
                        jnp.int32(0)])
    p, c, z, n, ne = sync_once(entry0)
    changed = jax.lax.psum(
        jnp.any(ne != entry0).astype(jnp.int32), axis) > 0

    def cond(st):
        return st[0] & (st[1] < D)

    # the state carries BOTH the entry that produced the current p/c/z
    # (used) and the freshly permuted one (next): if the loop exits via the
    # it == D cap while still changed, the decode below must pair p/c/z
    # with the entry they were synced from — pairing them with the newer
    # permuted entry would be an inconsistent (entry, states) pair and a
    # silently wrong decode. On convergence the two are equal anyway.
    def body(st):
        _, it, _, entry, p, c, z, n = st
        p, c, z, n, ne = sync_once(entry)
        ch = jax.lax.psum(
            jnp.any(ne != entry).astype(jnp.int32), axis) > 0
        return ch, it + 1, entry, ne, p, c, z, n

    _, _, entry_fin, _, p, c, z, n = jax.lax.while_loop(
        cond, body, (changed, jnp.int32(1), entry0, ne, p, c, z, n))

    # global write positions: local within-segment offsets, plus — for the
    # head-partial segment — the symbol counts its predecessors decoded
    n_off = H.symbol_offsets(cfg, arrs, n)
    lane = jnp.arange(cfg.lanes, dtype=jnp.int32)
    validl = lane < nsub
    gseg = seg_global[0]
    head_seg = gseg[0]
    last_seg = jnp.take(gseg, last)
    tail_sum = jnp.sum(jnp.where((gseg == last_seg) & validl, n, 0))
    trio = jnp.stack([last_seg, tail_sum, head_seg])
    g = jax.lax.all_gather(trio, axis)  # (D, 3)
    me = jax.lax.axis_index(axis)
    eidx = jnp.arange(D, dtype=me.dtype)
    prefix = jnp.sum(jnp.where((eidx < me) & (g[:, 0] == head_seg),
                               g[:, 1], 0))
    pps = cfg.positions_per_seg
    total = cfg.total_positions
    pos_base = gseg * pps + jnp.where(gseg == head_seg, prefix, 0)
    bound = jnp.minimum((gseg + 1) * pps, total)
    coeffs = H.decode_scan_from_states(
        cfg, arrs, ctx, p, c, z, n_off, pos_base=pos_base, bound=bound,
        total_out=padded_total,
        entry=(entry_fin[0], entry_fin[1], entry_fin[2]))
    # record supports are disjoint across shards: the reduce_scatter of
    # _tail_chunk merges them straight into per-shard MCU-row chunks
    return _tail_chunk(cfg, sp, with_idct, axis, D, rows, coeffs, qtables)


def _decode_scan_subseq(data: bytes, plan: DecodePlan, si: int, mesh: Mesh,
                        with_idct: bool):
    """Per-component plane row blocks of scan `si`, sharded at subsequence
    granularity (no-restart / fewer-segments-than-devices scans); the tail
    runs sharded and the planes return row-sharded."""
    D = mesh.devices.size
    shp = plan_subseq_shards(plan, D, si)
    inputs = build_subseq_shard_inputs(data, plan, shp, si)
    axis = mesh.axis_names[0]
    sp = plan.signature.scans[si]
    rows = _chunk_rows(sp.num_mcus_y, D)
    row_pos = sp.num_mcus_x * shp.cfg.du_per_mcu * C.DATA_UNIT_SIZE
    padded_total = D * rows * row_pos

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    dev_in = {k: jax.device_put(
        v, shard if k not in ("maxcode", "vsm", "huffval") else repl)
        for k, v in inputs.items()}
    dev_in["qtables"] = jax.device_put(
        plan.stream.qtables.astype(np.int32), repl)

    from jax import shard_map

    f = shard_map(
        partial(_subseq_shard_decode, shp, sp, with_idct, axis, rows,
                padded_total),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(), P(), P(), P()),
        out_specs=tuple(P(axis) for _ in sp.comps),
        check_vma=False,
    )
    return jax.jit(lambda i: f(
        i["words"], i["seg_of"], i["seg_first"], i["seg_nsub"],
        i["seg_global"], i["prev_word"], i["n_subseq"], i["qtables"],
        i["maxcode"], i["vsm"], i["huffval"]))(dev_in)


def decode_sharded(data: bytes, mesh: Mesh, *,
                   plan: Optional[DecodePlan] = None,
                   with_idct: bool = True) -> List[np.ndarray]:
    """Decode one image sharded across `mesh`: each scan at segment
    granularity when it has >= num_devices restart segments, else at
    subsequence granularity with cross-shard boundary sync. Multi-scan
    images decode scan-by-scan.

    The whole pipeline is sharded, tail included: coefficients merge by
    reduce_scatter into MCU-row chunks, DC un-delta crosses chunk seams via
    one per-component all_gather, and de-interleave + IDCT run on each
    shard's own rows — no device ever holds a replicated full-size
    intermediate, and the planes come back row-sharded."""
    if plan is None:
        plan = build_plan(parse(data))
    D = mesh.devices.size
    stream = plan.stream

    planes_by_comp = {}
    for si, scan in enumerate(stream.scans):
        if scan.num_segments >= D:
            planes = _decode_scan_segments(data, plan, si, mesh, with_idct)
        else:
            planes = _decode_scan_subseq(data, plan, si, mesh, with_idct)
        sp = plan.signature.scans[si]
        for c0, plane in zip(sp.comps, planes):
            planes_by_comp[c0[0]] = plane

    return [np.asarray(planes_by_comp[ci][:comp.size_y, :comp.size_x])
            for ci, comp in enumerate(stream.components)]
