"""Decode planning and the jitted device pipeline.

The reference's two-pass memory planner (decode_impl<do_it>,
src/decoder.cpp:216-334) exists to pre-size one device buffer; under XLA the
compiler plans buffers, so the planner's role here is *shape bucketing*: a
:class:`DecodePlan` captures the static geometry of a parsed stream, and the
jitted pipeline is cached per plan signature so images with equal geometry
(the common batch case) reuse one executable. Scan byte sizes, lane counts
and segment counts are rounded up to buckets to widen reuse; the padding is
constructed to be inert (see ops/destuff.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from .config import Tuning, default_tuning
from .ops.dc import undelta_dc
from .ops.destuff import destuff_scan
from .ops.huffman import ScanArrays, ScanConfig, decode_scan
from .ops.idct import dequant_idct_plane
from .ops.transpose import deinterleave
from .reader import JpegStream, Scan, num_mcus_in_segment, parse


def _bucket(n: int, quantum: int = 256) -> int:
    """Round up to a shape bucket: next multiple of `quantum` below
    4*quantum, then multiples of 8*quantum — bounds recompiles to O(n /
    (8*quantum)) per axis while capping lane padding at 8*quantum (the old
    power-of-two buckets wasted up to 2x width on every pass)."""
    n = max(n, 1)
    if n <= 4 * quantum:
        return -(-n // quantum) * quantum
    q = 8 * quantum
    return -(-n // q) * q


@dataclasses.dataclass(frozen=True)
class ScanPlanStatic:
    """Hashable static geometry of one scan."""

    cfg: ScanConfig
    scan_bytes_padded: int
    num_segments_padded: int
    num_mcus_x: int
    num_mcus_y: int
    # per scan component: (component_idx, off_in_mcu, ss_eff_x, ss_eff_y,
    #                      data_size_x, data_size_y, qtable_idx)
    comps: Tuple[Tuple[int, int, int, int, int, int, int], ...]
    # If true, destuffing runs on the host (native C++ with numpy fallback)
    # and the staged input is the destuffed word stream; if false, raw scan
    # bytes are staged and destuffed on device (ops/destuff.py). Host is the
    # production default: byte-granular scatter is not TPU-native, while the
    # host pass pipelines with the previous image's device decode.
    host_destuff: bool = True


@dataclasses.dataclass(frozen=True)
class PlanSignature:
    scans: Tuple[ScanPlanStatic, ...]
    # per component: (size_x, size_y)
    comp_sizes: Tuple[Tuple[int, int], ...]


@dataclasses.dataclass
class DecodePlan:
    signature: PlanSignature
    stream: JpegStream


def build_plan(stream: JpegStream, *, host_destuff: bool = True,
               tuning: Optional[Tuning] = None,
               pad_scans: Optional[Tuple[Tuple[int, int], ...]] = None
               ) -> DecodePlan:
    """Build the decode plan (static geometry) for a parsed stream.

    ``pad_scans`` optionally gives per-scan ``(lanes_floor, bytes_floor[,
    tile_d_floor])``
    lower bounds for the shape buckets: :class:`BatchDecoder` pads every
    image of a mixed group up to the group maxima so they share one
    executable (the padding is inert — lane validity is data-driven, see
    ops/huffman.py make_ctx).
    """
    if tuning is None:
        tuning = default_tuning()
    scans = []
    for si, scan in enumerate(stream.scans):
        lanes = _bucket(scan.num_subsequences)
        bytes_floor = 0
        # tile depth for the tile-assembly write: ~5x the stream's average
        # data-units-per-subsequence covers essentially every lane (the
        # write-position distribution is narrow; outliers drain through the
        # leftover scatter), bucketed so similar-density images share
        # executables
        avg_du = (scan.total_data_units /
                  max(scan.num_subsequences, 1))
        tile_d = next((d for d in (32, 64, 96, 128)
                       if d >= 5.0 * avg_du), 128)
        # supertile geometry (tile_mode="super"): G consecutive lanes
        # share one super_d-row data-unit window. Target <=~35% typical
        # fill (G*avg_du <= 0.35*super_d): low-entropy lanes span several
        # times the average, and a single over-spanning lane sends its
        # whole group's records to the leftover scatter — on the 12 MP
        # bench at D=128, G=4 leaves 3 span-over lanes where G=8 leaves
        # 644. Power of two for lane-bucket divisibility.
        super_d = tuning.super_d or 128
        super_g = tuning.super_g
        if not super_g:
            super_g = 2
            while super_g < 32 and (2 * super_g) * avg_du <= 0.703 * super_d:
                super_g *= 2
        # expand output-group size: data units gathered per expand grid
        # step. Larger groups amortize the per-step cost (window refetch,
        # dot issue) over more rows at the price of a wider one-hot build
        # per row; 256 measured best on v5e (2026-08-20 r5 sweep).
        group_du = tuning.group_du or 256
        # expand window: supertiles per group_du-wide output group. Dense
        # regions pack ~2-3x more supertiles per group than the global
        # average, so the window is 2x the average extent plus slack
        # (lanes past the window drain through the leftover scatter).
        avg_extent = -(-group_du // max(int(super_g * avg_du), 1))
        # 2x the average extent: measured on v5e 2026-08-20 (12 MP,
        # group_du 128, avg_extent 3): W=6 assembles in 5.02 ms vs 5.89 at
        # W=8, while W=4 (under 2x) floods the leftover scatter (15.7 ms)
        # — the 2x factor is the cliff margin, extra slack pure cost. The
        # cap scales with the group (VMEM window is W x 16 KiB — cheap).
        super_w = (tuning.super_w
                   or min(max(2 * avg_extent, 4), 4 + group_du // 16))
        # sparse scans (mid-quality large images, avg_du >~ 55): even the
        # minimum 2-lane supertile group typically spans >= the 128-row
        # window, sending ~every second lane through the serial leftover
        # scatter — route tile_mode="auto" to the per-lane path, whose
        # tile_d window holds a single sparse lane comfortably
        tile_auto = "lane" if avg_du > 55.0 else "super"
        # packed-huffval one-hot rows: longest used table, bucketed to a
        # multiple of 8 words (canonical AC tables: 162 symbols -> 48)
        hv_rows = max((t.num_symbols for t in scan.huff_tables),
                      default=0)
        hv_rows = min(max(-(-hv_rows // 32) * 8, 8), 64)
        # per-slot word counts for the select-tree value lookup (bucketed
        # to a multiple of 4 so near-size tables share executables)
        slot_rows = []
        for s in range(C.MAX_HUFF_PER_SCAN):
            n = (scan.huff_tables[s].num_symbols
                 if s < len(scan.huff_tables) else 0)
            words = -(-n // 4)
            slot_rows.append(min(max(-(-words // 4) * 4, 4), hv_rows))
        if pad_scans is not None and si < len(pad_scans):
            lanes = max(lanes, pad_scans[si][0])
            bytes_floor = pad_scans[si][1]
            if len(pad_scans[si]) > 2:
                tile_d = max(tile_d, pad_scans[si][2])
            if len(pad_scans[si]) > 3:
                hv_rows = max(hv_rows, pad_scans[si][3])
            if len(pad_scans[si]) > 4:
                slot_rows = [max(a, b) for a, b in
                             zip(slot_rows, pad_scans[si][4])]
            if len(pad_scans[si]) > 5:
                # smaller G is always safe (more supertiles, less span
                # overflow), so a mixed group takes the min
                super_g = min(super_g, pad_scans[si][5])
            if len(pad_scans[si]) > 6:
                super_w = max(super_w, pad_scans[si][6])
            if len(pad_scans[si]) > 7:
                # a mixed-density group takes "lane": correct and decent
                # for both regimes, where "super" is pathological for the
                # sparse members
                if pad_scans[si][7] == "lane":
                    tile_auto = "lane"
            if len(pad_scans[si]) > 8:
                group_du = max(group_du, pad_scans[si][8])
            if len(pad_scans[si]) > 9:
                # a larger window is always safe (less span overflow)
                super_d = max(super_d, pad_scans[si][9])
        slot_rows = [min(r, hv_rows) for r in slot_rows]
        comps = []
        for sc in scan.components:
            comp = stream.components[sc.component_idx]
            ss_x = comp.ss_x if scan.interleaved else 1
            ss_y = comp.ss_y if scan.interleaved else 1
            comps.append((sc.component_idx, sc.off_in_mcu, ss_x, ss_y,
                          sc.data_size_x, sc.data_size_y, comp.qtable_idx))
        comp_groups = []
        end = 0
        for sc in scan.components:
            end += sc.du_per_mcu
            comp_groups.append((end,
                                sc.dc_table_id * C.HUFF_COUNT + C.HUFF_DC,
                                sc.ac_table_id * C.HUFF_COUNT + C.HUFF_AC))
        used_slots = {g[1] for g in comp_groups} | {g[2] for g in comp_groups}
        fast_tables = not any(scan.huff_tables[s].saturated for s in used_slots)
        cfg = ScanConfig(
            # bucketed: the exact subsequence count is data (staged segment
            # tables), so equal-geometry images share an executable
            num_subseq=lanes,
            lanes=lanes,
            num_segments=scan.num_segments,
            du_per_mcu=scan.num_data_units_in_mcu,
            mcus_per_seg=num_mcus_in_segment(stream, scan),
            total_mcus=scan.num_mcus,
            comp_groups=tuple(comp_groups),
            fast_tables=fast_tables,
            tile_d=tile_d,
            super_g=super_g,
            super_w=super_w,
            super_d=super_d,
            group_du=group_du,
            tile_auto=tile_auto,
            hv_rows=hv_rows,
            hv_slot_rows=tuple(slot_rows),
            tuning=tuning,
        )
        scans.append(ScanPlanStatic(
            cfg=cfg,
            scan_bytes_padded=max(_bucket(scan.end - scan.begin, 1024),
                                  bytes_floor),
            num_segments_padded=_bucket(scan.num_segments, 64),
            num_mcus_x=scan.num_mcus_x,
            num_mcus_y=scan.num_mcus_y,
            comps=tuple(comps),
            host_destuff=host_destuff,
        ))
    sig = PlanSignature(
        scans=tuple(scans),
        comp_sizes=tuple((c.size_x, c.size_y) for c in stream.components),
    )
    return DecodePlan(signature=sig, stream=stream)


# --- host -> device staging -------------------------------------------------

def pack_huff_tables(scan: Scan) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    maxcode = np.full((C.MAX_HUFF_PER_SCAN, 16), -1, np.int32)
    vsm = np.zeros((C.MAX_HUFF_PER_SCAN, 16), np.int32)
    huffval = np.zeros((C.MAX_HUFF_PER_SCAN, 256), np.int32)
    for i, t in enumerate(scan.huff_tables):
        maxcode[i] = t.maxcode
        vsm[i] = t.valptr_sub_mincode
        huffval[i] = t.huffval
    return maxcode, vsm, huffval.reshape(-1)


def _destuff_host(buf: np.ndarray, scan: Scan, lanes: int) -> np.ndarray:
    """Host destuff -> big-endian uint32 words, padded to `lanes`
    subsequences (native C++ with numpy fallback)."""
    from . import native
    from .golden import destuff_scan_host

    body = buf[scan.begin:scan.end]
    full = native.destuff_words(body, scan.segments[:, 0],
                                scan.num_subsequences, lanes,
                                seg_raw=scan.seg_raw)
    if full is not None:
        return full
    out = native.destuff_host(body, scan.segments[:, 0],
                              scan.num_subsequences, seg_raw=scan.seg_raw)
    if out is None:
        out = destuff_scan_host(buf, scan)
    words = np.frombuffer(out.tobytes(), dtype=">u4").astype(np.uint32)
    full = np.zeros(lanes * C.CHUNK_SIZE_WORDS, np.uint32)
    full[:len(words)] = words
    return full


def build_scan_inputs(buf: np.ndarray, stream: JpegStream, scan: Scan,
                      sp: ScanPlanStatic) -> Dict[str, np.ndarray]:
    """Numpy arrays for one scan, padded to the plan's bucket shapes.

    This is the analog of the reference `transfer` phase
    (decoder.cpp:159-211): scan data, segment table and Huffman tables,
    staged once per image.
    """
    lanes = sp.cfg.lanes
    nseg_p = sp.num_segments_padded
    counts = scan.segments[:, 1]
    seg_of = np.repeat(np.arange(scan.num_segments, dtype=np.int32), counts)
    seg_of_subseq = np.full(lanes, max(scan.num_segments - 1, 0), np.int32)
    seg_of_subseq[:len(seg_of)] = seg_of
    seg_first_lane = np.zeros(lanes, np.int32)
    seg_num_subseq = np.zeros(lanes, np.int32)
    seg_first_lane[:len(seg_of)] = scan.segments[seg_of, 0]
    seg_num_subseq[:len(seg_of)] = scan.segments[seg_of, 1]
    if len(seg_of) < lanes and scan.num_segments:
        seg_first_lane[len(seg_of):] = scan.segments[-1, 0]
        seg_num_subseq[len(seg_of):] = scan.segments[-1, 1]

    maxcode, vsm, huffval = pack_huff_tables(scan)
    out = dict(
        seg_of_subseq=seg_of_subseq,
        seg_first_lane=seg_first_lane,
        seg_num_subseq=seg_num_subseq,
        maxcode=maxcode,
        vsm=vsm,
        huffval=huffval,
    )
    if sp.host_destuff:
        out["words"] = _destuff_host(buf, scan, lanes)
    else:
        raw = np.zeros(sp.scan_bytes_padded, np.uint8)
        body = buf[scan.begin:scan.end]
        raw[:len(body)] = body
        seg_sub_offset = np.full(nseg_p, scan.num_subsequences, np.int32)
        seg_sub_offset[:scan.num_segments] = scan.segments[:, 0]
        out["raw"] = raw
        out["seg_sub_offset"] = seg_sub_offset
    return out


def build_inputs(data: bytes | np.ndarray, plan: DecodePlan) -> Dict:
    buf = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) \
        else np.asarray(data, np.uint8)
    try:
        scans = [build_scan_inputs(buf, plan.stream, scan, sp)
                 for scan, sp in zip(plan.stream.scans, plan.signature.scans)]
    except MemoryError as exc:
        from .errors import OutOfHostMemory

        raise OutOfHostMemory(
            f"host staging buffers exceed available memory: {exc}") from exc
    return dict(scans=scans, qtables=plan.stream.qtables.astype(np.int32))


# --- the jitted pipeline ----------------------------------------------------

def decode_pipeline(signature: PlanSignature, scan_inputs: List[Dict],
                    qtables: jax.Array, with_idct: bool = True):
    """Traceable full-image decode. Returns per-component planes (uint8 if
    with_idct else int16 coefficient planes), cropped to component size."""
    planes: Dict[int, jax.Array] = {}
    qidx: Dict[int, int] = {}
    pix: Dict[int, jax.Array] = {}
    # fused tail on TPU: stream-order coefficients go straight to pixel
    # planes inside one Pallas kernel (de-interleave addressing via the
    # block index map), skipping the XLA 6D coefficient transpose
    fused_tail = with_idct and jax.default_backend() == "tpu"
    for sp, inp in zip(signature.scans, scan_inputs):
        cfg = sp.cfg
        if sp.host_destuff:
            words = inp["words"]
        else:
            words = destuff_scan(inp["raw"], inp["seg_sub_offset"], cfg.lanes)
        arrs = ScanArrays(
            words=words,
            seg_of_subseq=inp["seg_of_subseq"],
            seg_first_lane=inp["seg_first_lane"],
            seg_num_subseq=inp["seg_num_subseq"],
            maxcode=inp["maxcode"],
            vsm=inp["vsm"],
            huffval=inp["huffval"],
        )
        coeffs = decode_scan(cfg, arrs, return_dc=fused_tail)
        comp_slots = tuple((c[1], c[2] * c[3]) for c in sp.comps)
        if fused_tail:
            from .ops.dc import undelta_dc_values
            from .ops.idct_pallas import idct_stream_to_plane

            coeffs, dcd = coeffs
            # DC un-delta as a side vector: the fused IDCT kernel overrides
            # slot 0 from it, so the DC stage never rewrites the 37 MB
            # coefficient stream (the .at[:, 0].set form costs a full
            # copy). dcd, when the write path provides it, spares the
            # strided slot-0 extraction too.
            with jax.named_scope("jpeggpu.dc"):
                dcv = undelta_dc_values(cfg, comp_slots, coeffs, dc=dcd)
            with jax.named_scope("jpeggpu.idct_fused"):
                for c in sp.comps:
                    pix[c[0]] = idct_stream_to_plane(
                        coeffs, qtables[c[6]], sp.num_mcus_x, sp.num_mcus_y,
                        cfg.du_per_mcu, c[1], c[2], c[3], dc_override=dcv)
            continue
        with jax.named_scope("jpeggpu.dc"):
            coeffs = undelta_dc(cfg, comp_slots, coeffs)
        t_comps = [(c[1], c[2], c[3], 0) for c in sp.comps]
        with jax.named_scope("jpeggpu.deinterleave"):
            scan_planes = deinterleave(cfg, coeffs, sp.num_mcus_x,
                                       sp.num_mcus_y, t_comps)
        for c, plane in zip(sp.comps, scan_planes):
            planes[c[0]] = plane
            qidx[c[0]] = c[6]

    out = []
    for ci, (size_x, size_y) in enumerate(signature.comp_sizes):
        if ci in pix:
            out.append(pix[ci][:size_y, :size_x])
            continue
        plane = planes[ci]
        if with_idct:
            plane = dequant_idct_plane(plane, qtables[qidx[ci]])
        out.append(plane[:size_y, :size_x])
    return tuple(out)


@partial(jax.jit, static_argnums=(0, 3))
def _jit_pipeline(signature: PlanSignature, scan_inputs, qtables, with_idct):
    return decode_pipeline(signature, scan_inputs, qtables, with_idct)


# Donating variant: the staged scan buffers (words/raw, segment tables) are
# donated to the executable so XLA reuses them in place for pipeline
# temporaries — the analog of the reference's contract that the caller's
# d_tmp buffer is consumed by decode and reusable afterwards
# (jpeggpu.h:90-109). The donated device inputs are invalid after the call.
@partial(jax.jit, static_argnums=(0, 3), donate_argnums=(1,))
def _jit_pipeline_donate(signature: PlanSignature, scan_inputs, qtables,
                         with_idct):
    return decode_pipeline(signature, scan_inputs, qtables, with_idct)


# Caller-owned-output variant: decoded planes are written INTO the caller's
# (donated) device arrays — the XLA-native analog of the reference's output
# contract, where decode() writes each component into user-provided device
# memory with a per-component pitch (jpeggpu.h:95-100, validated at
# decoder.cpp:336-353). The donated buffer's trailing pitch columns/rows are
# preserved, exactly like the reference leaves bytes past `width` per row
# untouched; XLA aliases each output to its donated input so no output
# allocation happens, and the returned arrays occupy the caller's memory.
@partial(jax.jit, static_argnums=(0, 4), donate_argnums=(3,))
def _jit_pipeline_into(signature: PlanSignature, scan_inputs, qtables, outs,
                       with_idct):
    planes = decode_pipeline(signature, scan_inputs, qtables, with_idct)
    return tuple(
        jax.lax.dynamic_update_slice(o, p.astype(o.dtype), (0, 0))
        for o, p in zip(outs, planes))


# Explicit AOT executable cache. Compiling through .lower().compile() is both
# dramatically faster than dispatch-triggered compilation on this jax version
# and gives us an inspectable artifact (memory analysis, cost analysis) — the
# XLA-era answer to the reference's decode_get_size dry-run
# (decoder.cpp:327-334).
_EXEC_CACHE: Dict = {}


def get_compiled(plan: DecodePlan, inputs, with_idct: bool = True,
                 donate: bool = False):
    key = (plan.signature, with_idct, donate)
    exe = _EXEC_CACHE.get(key)
    if exe is None:
        fn = _jit_pipeline_donate if donate else _jit_pipeline
        exe = fn.lower(
            plan.signature, inputs["scans"], inputs["qtables"],
            with_idct).compile()
        _EXEC_CACHE[key] = exe
    return exe


def get_compiled_into(plan: DecodePlan, inputs, outs, with_idct: bool = True):
    """AOT executable for the caller-owned-output decode (see
    _jit_pipeline_into); cached per (signature, output buffer shapes)."""
    key = (plan.signature, with_idct, "into",
           tuple((o.shape, str(o.dtype)) for o in outs))
    exe = _EXEC_CACHE.get(key)
    if exe is None:
        exe = _jit_pipeline_into.lower(
            plan.signature, inputs["scans"], inputs["qtables"], tuple(outs),
            with_idct).compile()
        _EXEC_CACHE[key] = exe
    return exe


def decode_buffer_size(plan: DecodePlan, inputs, with_idct: bool = True) -> int:
    """Device memory footprint of the compiled decode, in bytes — the analog
    of jpeggpu_decoder_get_buffer_size (jpeggpu.h:87-88).

    Reports max(temporaries, arguments + outputs) from the executable's
    memory analysis: backends that plan no named temporaries (CPU) still
    report the real staging + result footprint, so the contract "memory is
    knowable from the header" holds everywhere. Raises InternalError if the
    backend exposes no memory analysis at all."""
    from .errors import InternalError

    exe = get_compiled(plan, inputs, with_idct)
    try:
        mem = exe.memory_analysis()
        temp = int(getattr(mem, "temp_size_in_bytes", 0))
        args = int(getattr(mem, "argument_size_in_bytes", 0))
        outs = int(getattr(mem, "output_size_in_bytes", 0))
    except Exception as exc:  # noqa: BLE001 - backend-specific failures
        raise InternalError(
            f"compiled executable exposes no memory analysis: {exc!r}")
    size = max(temp, args + outs)
    if size <= 0:
        raise InternalError("memory analysis reported a zero-size decode")
    return size


def decode_jpeg_device(data: bytes, *, with_idct: bool = True,
                       plan: Optional[DecodePlan] = None) -> List[np.ndarray]:
    """One-shot decode of a JPEG on the default JAX device."""
    if plan is None:
        plan = build_plan(parse(data))
    inputs = build_inputs(data, plan)
    exe = get_compiled(plan, inputs, with_idct)
    out = exe(inputs["scans"], inputs["qtables"])
    return [np.asarray(p) for p in out]
