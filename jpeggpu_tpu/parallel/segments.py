"""Segment-sharded single-image decode: the workload's sequence parallelism.

Restart-interval segments are fully independent decode units (bit position,
DC prediction and MCU count all reset at each marker — reader.hpp:34-43), so
one large image can be decoded across a device mesh by giving each device a
contiguous group of segments. This is the TPU-native answer to BASELINE
config 2 ("restart-segment-parallel Huffman decode") and the scaling axis the
single-GPU reference lacks.

Mechanics:
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


def plan_shards(plan: DecodePlan, num_shards: int) -> ShardPlanStatic:
    stream = plan.stream
    if len(stream.scans) != 1:
        raise NotSupported("segment sharding requires a single-scan image")
    scan = stream.scans[0]
    if scan.num_segments < num_shards:
        raise NotSupported(
            f"image has {scan.num_segments} restart segments; need >= "
            f"{num_shards} to shard across the mesh")
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

    sp = plan.signature.scans[0]
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
                       shp: ShardPlanStatic) -> dict:
    """Host staging: per-shard words/segment arrays, stacked on a leading
    shard axis (tables replicated)."""
    stream = plan.stream
    scan = stream.scans[0]
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


def decode_sharded(data: bytes, mesh: Mesh, *,
                   plan: Optional[DecodePlan] = None,
                   with_idct: bool = True) -> List[np.ndarray]:
    """Decode one image with its restart segments sharded across `mesh`."""
    if plan is None:
        plan = build_plan(parse(data))
    D = mesh.devices.size
    shp = plan_shards(plan, D)
    inputs = build_shard_inputs(data, plan, shp)
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
    coeffs = jnp.concatenate(pieces)

    # tail stages on the gathered stream
    sp = plan.signature.scans[0]
    scan_cfg = sp.cfg
    comp_slots = tuple((c0[1], c0[2] * c0[3]) for c0 in sp.comps)
    coeffs = undelta_dc(scan_cfg, comp_slots, coeffs)
    t_comps = [(c0[1], c0[2], c0[3], 0) for c0 in sp.comps]
    planes = deinterleave(scan_cfg, coeffs, sp.num_mcus_x, sp.num_mcus_y,
                          t_comps)
    stream = plan.stream
    out = []
    for c0, plane in zip(sp.comps, planes):
        comp = stream.components[c0[0]]
        if with_idct:
            q = jnp.asarray(stream.qtables[c0[6]].astype(np.int32))
            plane = dequant_idct_plane(plane, q)
        out.append(np.asarray(plane[:comp.size_y, :comp.size_x]))
    return out
