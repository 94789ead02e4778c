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
- shard coefficient slices concatenate in segment order — positions of
  consecutive segment groups are contiguous, so the "ordered gather of
  planes" is a plain axis concatenation followed by static trimming;
- DC un-delta / de-interleave / IDCT then run on the gathered stream (they
  are a few percent of the work).

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
from ..ops.dc import undelta_dc
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


def _shard_decode(shp: ShardPlanStatic, words, seg_of, seg_first, seg_nsub,
                  pos_base, pos_bound, n_subseq, maxcode, vsm, huffval):
    # shard_map passes per-device blocks with a leading axis of size 1
    arrs = ScanArrays(words=words[0], seg_of_subseq=seg_of[0],
                      seg_first_lane=seg_first[0], seg_num_subseq=seg_nsub[0],
                      maxcode=maxcode, vsm=vsm, huffval=huffval)
    coeffs = decode_scan(shp.cfg, arrs, num_subseq=n_subseq[0, 0],
                         pos_base=pos_base[0], bound=pos_bound[0],
                         total_out=shp.shard_positions)
    return coeffs[None, :]


def _decode_scan_segments(data: bytes, plan: DecodePlan, si: int,
                          mesh: Mesh) -> jax.Array:
    """Coefficient stream of scan `si`, sharded at segment granularity."""
    D = mesh.devices.size
    shp = plan_shards(plan, D, si)
    inputs = build_shard_inputs(data, plan, shp, si)
    axis = mesh.axis_names[0]

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    dev_in = {k: jax.device_put(
        v, shard if k not in ("maxcode", "vsm", "huffval") else repl)
        for k, v in inputs.items()}

    from jax import shard_map

    f = shard_map(
        partial(_shard_decode, shp),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    # each shard yields (1, shard_positions); the stacked result on the
    # shard axis is the ordered gather of the coefficient stream
    coeffs_sh = jax.jit(lambda i: f(
        i["words"], i["seg_of"], i["seg_first"], i["seg_nsub"],
        i["pos_base"], i["pos_bound"], i["n_subseq"],
        i["maxcode"], i["vsm"], i["huffval"]))(dev_in)

    pieces = [coeffs_sh[d, :shp.real_positions[d]] for d in range(D)]
    return jnp.concatenate(pieces)


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


def _subseq_shard_decode(shp: SubseqShardStatic, axis: str, words, seg_of,
                         seg_first, seg_nsub, seg_global, prev_word,
                         n_subseq, maxcode, vsm, huffval):
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
        total_out=total,
        entry=(entry_fin[0], entry_fin[1], entry_fin[2]))
    # record supports are disjoint across shards: the sum is the merge
    return jax.lax.psum(coeffs, axis)


def _decode_scan_subseq(data: bytes, plan: DecodePlan, si: int,
                        mesh: Mesh) -> jax.Array:
    """Coefficient stream of scan `si`, sharded at subsequence granularity
    (no-restart / fewer-segments-than-devices scans)."""
    D = mesh.devices.size
    shp = plan_subseq_shards(plan, D, si)
    inputs = build_subseq_shard_inputs(data, plan, shp, si)
    axis = mesh.axis_names[0]

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    dev_in = {k: jax.device_put(
        v, shard if k not in ("maxcode", "vsm", "huffval") else repl)
        for k, v in inputs.items()}

    from jax import shard_map

    f = shard_map(
        partial(_subseq_shard_decode, shp, axis),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(lambda i: f(
        i["words"], i["seg_of"], i["seg_first"], i["seg_nsub"],
        i["seg_global"], i["prev_word"], i["n_subseq"],
        i["maxcode"], i["vsm"], i["huffval"]))(dev_in)


def decode_sharded(data: bytes, mesh: Mesh, *,
                   plan: Optional[DecodePlan] = None,
                   with_idct: bool = True) -> List[np.ndarray]:
    """Decode one image sharded across `mesh`: each scan at segment
    granularity when it has >= num_devices restart segments, else at
    subsequence granularity with cross-shard boundary sync. Multi-scan
    images decode scan-by-scan."""
    if plan is None:
        plan = build_plan(parse(data))
    D = mesh.devices.size
    stream = plan.stream

    planes_by_comp = {}
    qidx = {}
    for si, scan in enumerate(stream.scans):
        if scan.num_segments >= D:
            coeffs = _decode_scan_segments(data, plan, si, mesh)
        else:
            coeffs = _decode_scan_subseq(data, plan, si, mesh)
        sp = plan.signature.scans[si]
        scan_cfg = sp.cfg
        comp_slots = tuple((c0[1], c0[2] * c0[3]) for c0 in sp.comps)
        coeffs = undelta_dc(scan_cfg, comp_slots, coeffs)
        t_comps = [(c0[1], c0[2], c0[3], 0) for c0 in sp.comps]
        planes = deinterleave(scan_cfg, coeffs, sp.num_mcus_x,
                              sp.num_mcus_y, t_comps)
        for c0, plane in zip(sp.comps, planes):
            planes_by_comp[c0[0]] = plane
            qidx[c0[0]] = c0[6]

    out = []
    for ci, comp in enumerate(stream.components):
        plane = planes_by_comp[ci]
        if with_idct:
            q = jnp.asarray(stream.qtables[qidx[ci]].astype(np.int32))
            plane = dequant_idct_plane(plane, q)
        out.append(np.asarray(plane[:comp.size_y, :comp.size_x]))
    return out
