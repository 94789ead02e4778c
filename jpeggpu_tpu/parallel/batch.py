"""Batched, sharded decode: the multi-chip story the reference lacks.

The reference decodes one image per call on one GPU (README.md:45) — its
parallelism is purely intra-image. On TPU the natural scaling axes are:

- batch: images with equal geometry stack into one executable; every
  per-symbol vector op widens from `lanes` to `batch*lanes` elements, which
  amortizes loop and dispatch overhead (the dominant cost at 1 image),
- mesh: the batch axis is sharded over a `jax.sharding.Mesh` with
  `NamedSharding`; decode is embarrassingly data-parallel so XLA inserts no
  collectives on the hot path; Huffman/quant tables travel with each image
  (broadcast once per batch in the staging step).

Images whose geometry buckets differ cannot share an executable; the
:class:`BatchDecoder` groups inputs by plan signature and runs one batch
per group, preserving input order in its output.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline import (
    DecodePlan,
    PlanSignature,
    build_inputs,
    build_plan,
    decode_pipeline,
)
from ..reader import parse


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis_name,))


def _stack(trees: List) -> object:
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *trees)


@partial(jax.jit, static_argnums=(0, 3))
def _batched_pipeline(signature: PlanSignature, scan_inputs, qtables,
                      with_idct: bool):
    fn = lambda s, q: decode_pipeline(signature, s, q, with_idct)
    return jax.vmap(fn)(scan_inputs, qtables)


# --- merged-lane batching ---------------------------------------------------
#
# vmap-ing the decode lowers poorly (batched scatters and nested loops), and
# it widens nothing: every per-symbol vector op stays `lanes` wide. Decoding
# is lane-parallel, so a batch of B same-geometry images that share Huffman
# tables IS one bigger decode: concatenate the images along the lane axis
# (each image's segments become more independent segments), run the standard
# single-image machinery once at B*lanes width, and split the coefficient
# stream per image for the cheap tail stages.

def _merged_scan_coeffs(sp, scans_merged, batch: int,
                        return_dc: bool = False):
    from ..ops.huffman import ScanArrays, decode_scan

    cfg0 = sp.cfg
    cfg_m = dataclasses.replace(cfg0, lanes=batch * cfg0.lanes,
                                num_subseq=batch * cfg0.lanes)
    arrs = ScanArrays(
        words=scans_merged["words"],
        seg_of_subseq=scans_merged["seg_of_subseq"],
        seg_first_lane=scans_merged["seg_first_lane"],
        seg_num_subseq=scans_merged["seg_num_subseq"],
        maxcode=scans_merged["maxcode"],
        vsm=scans_merged["vsm"],
        huffval=scans_merged["huffval"],
    )
    out = decode_scan(
        cfg_m, arrs,
        pos_base=scans_merged["pos_base"],
        bound=scans_merged["pos_bound"],
        total_out=batch * cfg0.total_positions,
        return_dc=return_dc,
    )
    if return_dc:
        # coeffs stay FLAT: per-image views are static 1D slices, where a
        # (batch, total) reshape relayouts whenever total is not a
        # multiple of 128
        return out
    return out.reshape(batch, cfg0.total_positions)


def _merged_scan_coeffs_split(sp, scans_merged, batch: int):
    """Merged-lane entropy decode, per-image coefficient assembly.

    Sync/offsets/emit run once at batch*lanes width (the per-symbol fixed
    costs amortize across images — the point of merging), but the write
    assembly runs per image at single-image shapes: the merged-size
    leftover scatter and flatten relayouts lower pathologically on
    XLA:TPU (profiled 2026-08-20: ~60 ms of full-array copies per batch
    at B=8), while stage1/expand cost exactly B x the single-image price
    either way. Emit-buffer lane slices are layout-aligned (the per-image
    lane bucket is a multiple of 128).

    Returns a list of (coeffs, dc) per image; falls back to the whole-
    merged decode for per-lane tile scans (rare: sparse mid-quality
    streams), returning (coeffs, None) tuples.
    """
    from ..ops import huffman as H
    from ..ops import write_pallas as WP
    from ..ops.huffman import ScanArrays

    cfg0 = sp.cfg
    L = cfg0.lanes
    T = cfg0.total_positions
    tdu = T // 64
    mode = WP.resolve_tile_mode(cfg0.tuning.tile_mode, cfg0.tile_auto)
    if mode != "super":
        co = _merged_scan_coeffs(sp, scans_merged, batch, return_dc=True)[0]
        return [(co[b * T:(b + 1) * T], None) for b in range(batch)]

    cfg_m = dataclasses.replace(cfg0, lanes=batch * L, num_subseq=batch * L)
    arrs = ScanArrays(
        words=scans_merged["words"],
        seg_of_subseq=scans_merged["seg_of_subseq"],
        seg_first_lane=scans_merged["seg_first_lane"],
        seg_num_subseq=scans_merged["seg_num_subseq"],
        maxcode=scans_merged["maxcode"],
        vsm=scans_merged["vsm"],
        huffval=scans_merged["huffval"],
    )
    ctx = H.make_ctx(cfg_m, arrs)
    p, c, z, n = H.sync_states(cfg_m, arrs, ctx)
    n_off = H.symbol_offsets(cfg_m, arrs, n)
    rec, m = H.decode_write_emit(
        cfg_m, arrs, ctx, p, c, z, n_off,
        pos_base=scans_merged["pos_base"], bound=scans_merged["pos_bound"],
        total_out=batch * T)
    pos0 = scans_merged["pos_base"] + n_off
    du0 = pos0 >> 6
    out = []
    for b in range(batch):
        sl = slice(b * L, (b + 1) * L)
        co, dcb = WP.assemble_supertiles(
            rec[:, sl], m[sl], du0[sl] - b * tdu, pos0[sl], T,
            cfg0.super_g, cfg0.super_w, s_trim=cfg0.tuning.s_trim,
            dot=WP.resolve_super_dot(cfg0.tuning.tile_dot),
            expand_dot=cfg0.tuning.expand_dot, return_dc=True,
            pos_offset=b * T, group_du=cfg0.group_du,
            super_d=cfg0.super_d)
        out.append((co, dcb))
    return out


def _merged_pipeline_body(signature: PlanSignature, merged_scans, qtables,
                          with_idct: bool):
    from ..ops.dc import undelta_dc, undelta_dc_values
    from ..ops.idct import dequant_idct_plane
    from ..ops.transpose import deinterleave

    batch = qtables.shape[0]
    planes_by_comp = {}
    qidx = {}
    pix_by_comp = {}
    # fused tail on TPU, mirroring pipeline.decode_pipeline: DC as a side
    # vector + one stream->plane Pallas IDCT per (image, component). The
    # split tail this replaces (vmapped full-stream undelta_dc rewrite +
    # XLA 6D deinterleave + blocked IDCT) cost ~3x the whole fused tail
    # PER IMAGE, which is why round-3 batch throughput trailed the
    # single-image slope. The static per-image loop is fine at production
    # batch sizes (DEFAULT_BATCH * comps Pallas instances per scan).
    fused_tail = with_idct and jax.default_backend() == "tpu"
    for sp, ms in zip(signature.scans, merged_scans):
        cfg = sp.cfg
        comp_slots = tuple((c[1], c[2] * c[3]) for c in sp.comps)
        t_comps = [(c[1], c[2], c[3], 0) for c in sp.comps]

        if fused_tail:
            from ..ops.idct_pallas import idct_stream_to_plane

            per_image = _merged_scan_coeffs_split(sp, ms, batch)
            planes_b = {c[0]: [] for c in sp.comps}
            for b, (cb, dcb) in enumerate(per_image):
                dcv = undelta_dc_values(cfg, comp_slots, cb, dc=dcb)
                for c in sp.comps:
                    planes_b[c[0]].append(idct_stream_to_plane(
                        cb, qtables[b, c[6]], sp.num_mcus_x,
                        sp.num_mcus_y, cfg.du_per_mcu, c[1], c[2], c[3],
                        dc_override=dcv))
            for ci, ps in planes_b.items():
                pix_by_comp[ci] = jnp.stack(ps)
            continue

        coeffs = _merged_scan_coeffs(sp, ms, batch)

        def tail(co):
            co = undelta_dc(cfg, comp_slots, co)
            return deinterleave(cfg, co, sp.num_mcus_x, sp.num_mcus_y,
                                t_comps)

        scan_planes = jax.vmap(tail)(coeffs)
        for c, plane in zip(sp.comps, scan_planes):
            planes_by_comp[c[0]] = plane
            qidx[c[0]] = c[6]

    out = []
    for ci, (size_x, size_y) in enumerate(signature.comp_sizes):
        if ci in pix_by_comp:
            out.append(pix_by_comp[ci][:, :size_y, :size_x])
            continue
        plane = planes_by_comp[ci]
        if with_idct:
            plane = jax.vmap(dequant_idct_plane)(plane, qtables[:, qidx[ci]])
        out.append(plane[:, :size_y, :size_x])
    return tuple(out)


@partial(jax.jit, static_argnums=(0, 3))
def _merged_pipeline(signature: PlanSignature, merged_scans, qtables,
                     with_idct: bool):
    return _merged_pipeline_body(signature, merged_scans, qtables, with_idct)


# --- mesh-merged batching -----------------------------------------------------
#
# On a mesh, the batch is split into one merged-lane group per device: each
# device decodes its B/D images as ONE wide decode (the same merged-lane
# machinery as the single-device path), under shard_map so XLA runs the
# identical SPMD program per device with no hot-path collectives. This
# replaces the vmapped pipeline, whose batched scatters lower
# catastrophically (BENCH.md "History").

def _mesh_merged_fn(signature: PlanSignature, with_idct: bool,
                    merged_scans, qtables):
    # per-device blocks carry a leading shard axis of size 1
    strip = jax.tree.map(lambda x: x[0], merged_scans)
    out = _merged_pipeline_body(signature, strip, qtables[0], with_idct)
    return tuple(p[None] for p in out)


def mesh_merged_exec(signature: PlanSignature, mesh: Mesh, merged_scans,
                     qtables, with_idct: bool):
    """Compile the shard_map'd merged-lane decode for stacked per-shard
    inputs (leading axis = mesh size, sharded; every leaf sharded on it)."""
    from jax import shard_map

    axis = mesh.axis_names[0]
    f = shard_map(
        partial(_mesh_merged_fn, signature, with_idct),
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(f).lower(merged_scans, qtables).compile()


def _stack_merged_shards(sig: PlanSignature, batch_inputs: List[Dict],
                         num_shards: int):
    """Split B staged images into num_shards merged-lane groups of B/D and
    stack each group's merged arrays on a leading shard axis."""
    B = len(batch_inputs)
    assert B % num_shards == 0, (B, num_shards)
    k = B // num_shards
    per_shard = []
    for d in range(num_shards):
        sub = batch_inputs[d * k:(d + 1) * k]
        merged = [merge_scan_inputs(sp, [bi["scans"][s] for bi in sub])
                  for s, sp in enumerate(sig.scans)]
        qt = np.stack([bi["qtables"] for bi in sub])
        per_shard.append((merged, qt))
    merged_stacked = jax.tree.map(
        lambda *xs: np.stack(xs, axis=0), *[m for m, _ in per_shard])
    qt_stacked = np.stack([q for _, q in per_shard])
    return merged_stacked, qt_stacked, k


def merge_scan_inputs(sp, per_image: List[Dict]) -> Dict[str, np.ndarray]:
    """Concatenate B images' staged arrays for one scan along the lane axis
    (requires host_destuff plans; tables taken from image 0 — caller must
    verify they are shared)."""
    import jpeggpu_tpu.constants as C

    cfg = sp.cfg
    L = cfg.lanes
    B = len(per_image)
    pps = cfg.positions_per_seg
    total = cfg.total_positions
    # merged positions are int32 on device; callers (BatchDecoder) split
    # oversized groups into sub-batches before reaching this point
    if B * total >= 2 ** 31:
        raise ValueError(
            f"merged batch of {B} images x {total} positions overflows int32 "
            f"position indices; split into sub-batches")
    words = np.concatenate([i["words"] for i in per_image])
    seg_of = np.concatenate([i["seg_of_subseq"] + b * cfg.num_segments
                             for b, i in enumerate(per_image)])
    seg_first = np.concatenate([i["seg_first_lane"] + b * L
                                for b, i in enumerate(per_image)])
    seg_nsub = np.concatenate([i["seg_num_subseq"] for i in per_image])
    seg_local = np.concatenate([i["seg_of_subseq"] for i in per_image])
    img_of = np.repeat(np.arange(B, dtype=np.int64), L)
    pos_base = (img_of * total + seg_local.astype(np.int64) * pps)
    pos_bound = np.minimum((seg_local.astype(np.int64) + 1) * pps, total) + \
        img_of * total
    return dict(
        words=words, seg_of_subseq=seg_of, seg_first_lane=seg_first,
        seg_num_subseq=seg_nsub,
        pos_base=pos_base.astype(np.int32),
        pos_bound=pos_bound.astype(np.int32),
        maxcode=per_image[0]["maxcode"], vsm=per_image[0]["vsm"],
        huffval=per_image[0]["huffval"],
    )


def _tables_shared(per_image: List[Dict]) -> bool:
    first = per_image[0]
    return all(
        np.array_equal(i["maxcode"], first["maxcode"]) and
        np.array_equal(i["vsm"], first["vsm"]) and
        np.array_equal(i["huffval"], first["huffval"])
        for i in per_image[1:])


def _geometry_key(sig: PlanSignature) -> PlanSignature:
    """Signature with the content-dependent shape buckets erased: images
    with equal keys can share an executable after padding to common
    buckets."""
    scans = tuple(
        dataclasses.replace(
            sp, scan_bytes_padded=0,
            cfg=dataclasses.replace(sp.cfg, num_subseq=0, lanes=0,
                                    tile_d=0, super_g=0, super_w=0,
                                    super_d=0, group_du=0, tile_auto="",
                                    hv_rows=0, hv_slot_rows=(0,) * 8))
        for sp in sig.scans)
    return PlanSignature(scans=scans, comp_sizes=sig.comp_sizes)


@dataclasses.dataclass
class _Group:
    plan: DecodePlan
    indices: List[int]
    inputs: List[Dict]


class BatchDecoder:
    """Decode batches of JPEGs, optionally sharded across a device mesh.

    On a single device, same-geometry images that share Huffman tables are
    decoded through the merged-lane path (one decode at batch*lanes width);
    otherwise a vmapped pipeline is used. On a mesh, the batch axis is
    sharded data-parallel.
    """

    def __init__(self, mesh: Optional[Mesh] = None, with_idct: bool = True,
                 merged: bool = True):
        self.mesh = mesh
        self.with_idct = with_idct
        self.merged = merged
        self._exec_cache: Dict = {}

    def _shard(self, tree, batch: int):
        if self.mesh is None:
            return tree
        axis = self.mesh.axis_names[0]
        sharding = NamedSharding(self.mesh, P(axis))
        return jax.device_put(tree, sharding)

    def _get_exec(self, sig: PlanSignature, batch: int, scans, qtables):
        key = (sig, batch, self.with_idct,
               None if self.mesh is None else tuple(map(str, self.mesh.devices.flat)))
        exe = self._exec_cache.get(key)
        if exe is None:
            exe = _batched_pipeline.lower(sig, scans, qtables,
                                          self.with_idct).compile()
            self._exec_cache[key] = exe
        return exe

    def _decode_mesh_merged(self, sig: PlanSignature,
                            batch_inputs: List[Dict], D: int):
        """Mesh path: one merged-lane decode of B/D images per device under
        shard_map (no hot-path collectives; each plane returns sharded on
        its leading batch axis)."""
        merged_stacked, qt_stacked, k = _stack_merged_shards(
            sig, batch_inputs, D)
        axis = self.mesh.axis_names[0]
        sharding = NamedSharding(self.mesh, P(axis))
        dev_merged = jax.device_put(merged_stacked, sharding)
        dev_qt = jax.device_put(qt_stacked, sharding)
        key = (sig, k, self.with_idct, "mesh_merged",
               tuple(map(str, self.mesh.devices.flat)))
        exe = self._exec_cache.get(key)
        if exe is None:
            exe = mesh_merged_exec(sig, self.mesh, dev_merged, dev_qt,
                                   self.with_idct)
            self._exec_cache[key] = exe
        out = exe(dev_merged, dev_qt)
        # (D, k, H, W) -> (B, H, W)
        return [np.asarray(p).reshape((-1,) + p.shape[2:]) for p in out]

    def decode(self, datas: Sequence[bytes]) -> List[List[np.ndarray]]:
        """Decode a sequence of JPEGs; returns per-image component planes in
        input order. Images are grouped by *pixel geometry* (size, sampling,
        restart structure); within a group the content-dependent shape
        buckets (lane count, scan bytes) are padded up to the group maxima so
        every image shares ONE executable — stream-length variation between
        photographs of equal dimensions no longer recompiles. Batch sizes
        that do not divide the mesh are padded by repeating the last image."""
        parsed = [parse(data) for data in datas]
        prelim = [build_plan(s) for s in parsed]
        geo: Dict[PlanSignature, List[int]] = {}
        for i, plan in enumerate(prelim):
            geo.setdefault(_geometry_key(plan.signature), []).append(i)

        groups: Dict[PlanSignature, _Group] = {}
        for idxs in geo.values():
            nscans = len(prelim[idxs[0]].signature.scans)
            pad = tuple(
                (max(prelim[i].signature.scans[s].cfg.lanes for i in idxs),
                 max(prelim[i].signature.scans[s].scan_bytes_padded
                     for i in idxs),
                 max(prelim[i].signature.scans[s].cfg.tile_d for i in idxs),
                 max(prelim[i].signature.scans[s].cfg.hv_rows for i in idxs),
                 tuple(max(prelim[i].signature.scans[s].cfg.hv_slot_rows[t]
                           for i in idxs) for t in range(8)),
                 min(prelim[i].signature.scans[s].cfg.super_g for i in idxs),
                 max(prelim[i].signature.scans[s].cfg.super_w for i in idxs),
                 ("lane" if any(
                     prelim[i].signature.scans[s].cfg.tile_auto == "lane"
                     for i in idxs) else "super"),
                 max(prelim[i].signature.scans[s].cfg.group_du
                     for i in idxs),
                 max(prelim[i].signature.scans[s].cfg.super_d
                     for i in idxs))
                for s in range(nscans))
            for i in idxs:
                plan = (prelim[i] if len(idxs) == 1
                        else build_plan(parsed[i], pad_scans=pad))
                g = groups.get(plan.signature)
                if g is None:
                    g = groups[plan.signature] = _Group(plan, [], [])
                g.indices.append(i)
                g.inputs.append(build_inputs(datas[i], plan))

        results: List[Optional[List[np.ndarray]]] = [None] * len(datas)
        for sig, g in groups.items():
            n = len(g.inputs)
            pad = 0
            if self.mesh is not None:
                m = self.mesh.devices.size
                pad = (-n) % m
            batch_inputs = g.inputs + [g.inputs[-1]] * pad
            mergeable = (
                self.merged
                and all(sp.host_destuff for sp in sig.scans)
                and all(_tables_shared([bi["scans"][s] for bi in batch_inputs])
                        for s in range(len(sig.scans))))
            max_total = max(sp.cfg.total_positions for sp in sig.scans)
            if mergeable and self.mesh is not None:
                D = self.mesh.devices.size
                k = len(batch_inputs) // D
                # int32 position indices bound the per-shard merge width
                if k * max_total < 2 ** 31:
                    out = self._decode_mesh_merged(sig, batch_inputs, D)
                    planes = [np.asarray(p) for p in out]
                    for bi, i in enumerate(g.indices):
                        results[i] = [p[bi] for p in planes]
                    continue
            use_merged = (mergeable and self.mesh is None
                          and len(batch_inputs) > 1)
            qtables = np.stack([bi["qtables"] for bi in batch_inputs])
            if use_merged:
                # int32 position indices cap one merged decode at
                # floor((2^31-1) / total_positions) images; larger groups
                # run as several merged sub-batches
                max_total = max(sp.cfg.total_positions for sp in sig.scans)
                limit = max(1, (2 ** 31 - 1) // max_total)
                chunks: List[np.ndarray] = []
                for lo in range(0, len(batch_inputs), limit):
                    sub = batch_inputs[lo:lo + limit]
                    sub_q = qtables[lo:lo + limit]
                    merged = [merge_scan_inputs(sp, [bi["scans"][s]
                                                     for bi in sub])
                              for s, sp in enumerate(sig.scans)]
                    key = (sig, len(sub), self.with_idct, "merged")
                    exe = self._exec_cache.get(key)
                    if exe is None:
                        exe = _merged_pipeline.lower(
                            sig, merged, sub_q, self.with_idct).compile()
                        self._exec_cache[key] = exe
                    chunks.append(exe(merged, sub_q))
                out = [np.concatenate([np.asarray(ch[k]) for ch in chunks])
                       for k in range(len(chunks[0]))]
            else:
                scans = [_stack([bi["scans"][s] for bi in batch_inputs])
                         for s in range(len(sig.scans))]
                scans = self._shard(scans, n + pad)
                qtables = self._shard(qtables, n + pad)
                exe = self._get_exec(sig, n + pad, scans, qtables)
                out = exe(scans, qtables)
            planes = [np.asarray(p) for p in out]
            for bi, i in enumerate(g.indices):
                results[i] = [p[bi] for p in planes]
        return results  # type: ignore[return-value]


def decode_batch(datas: Sequence[bytes], mesh: Optional[Mesh] = None,
                 with_idct: bool = True) -> List[List[np.ndarray]]:
    return BatchDecoder(mesh=mesh, with_idct=with_idct).decode(datas)
