"""Public decoder API: the five-phase protocol of the reference C API.

Maps the reference's contract (include/jpeggpu/jpeggpu.h:38-111) onto the
XLA execution model:

  reference                      here
  ---------                      ----
  jpeggpu_decoder_startup        Decoder()
  _parse_header                  Decoder.parse_header(data) -> ImgInfo
  _get_buffer_size               Decoder.get_buffer_size() -> bytes (from
                                 the compiled executable's memory analysis)
  _transfer                      Decoder.transfer()  (async device_put of
                                 scan bytes, tables, segment arrays)
  _decode                        Decoder.decode() -> planes
  _cleanup                       Decoder.cleanup() / context manager

Properties preserved in spirit: a reusable handle; no hidden blocking
between phases (transfer and decode dispatch asynchronously; results
materialize on read); independent handles are independent (thread safety by
isolation); a runtime logging toggle.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from . import constants as C
from .errors import InvalidArgument
from .pipeline import (
    DecodePlan,
    build_inputs,
    build_plan,
    get_compiled,
)
from .reader import parse
from .utils.color import to_rgb


@dataclasses.dataclass
class ImgInfo:
    """Mirror of jpeggpu_img_info (jpeggpu.h:73-80)."""

    sizes_x: List[int]
    sizes_y: List[int]
    num_components: int
    subsampling: List[Tuple[int, int]]


class Decoder:
    """Reusable decoder handle (analog of jpeggpu_decoder_t)."""

    def __init__(self, *, host_destuff: bool = True):
        self._logging = False
        self._host_destuff = bool(host_destuff)
        self._plan: Optional[DecodePlan] = None
        self._data: Optional[bytes] = None
        self._staged = None
        self._device_inputs = None

    # -- phase 0: logging toggle (jpeggpu.h:61-62) --
    def set_logging(self, enabled: bool) -> None:
        self._logging = bool(enabled)

    def _log(self, msg: str) -> None:
        if self._logging:
            print(msg, flush=True)

    # -- phase 1: host-only header parse (jpeggpu.h:81-85) --
    def parse_header(self, data: bytes) -> ImgInfo:
        stream = parse(data, log=self._log if self._logging else None)
        self._plan = build_plan(stream, host_destuff=self._host_destuff)
        self._data = data
        self._staged = None
        self._device_inputs = None
        comps = stream.components
        return ImgInfo(
            sizes_x=[c.size_x for c in comps],
            sizes_y=[c.size_y for c in comps],
            num_components=stream.num_components,
            subsampling=[(c.ss_x, c.ss_y) for c in comps],
        )

    def _require_plan(self) -> DecodePlan:
        if self._plan is None:
            raise InvalidArgument("parse_header must be called first")
        return self._plan

    # -- phase 2: device memory accounting (jpeggpu.h:87-88) --
    def get_buffer_size(self) -> int:
        """Device memory the compiled decode uses, in bytes.

        Under XLA the compiler owns buffer planning, so this is reported
        from the compiled executable rather than reserved by the caller —
        the contract it preserves is "memory is knowable from the header".
        Raises InternalError if the backend cannot report memory use.
        """
        from .pipeline import decode_buffer_size

        plan = self._require_plan()
        return decode_buffer_size(plan, self._host_inputs(), True)

    def _host_inputs(self):
        if self._staged is None:
            self._staged = build_inputs(self._data, self._require_plan())
        return self._staged

    # -- phase 3: async host->device staging (jpeggpu.h:90-93) --
    def transfer(self) -> None:
        import jax

        inputs = self._host_inputs()
        self._device_inputs = jax.device_put(
            {"scans": inputs["scans"], "qtables": inputs["qtables"]})

    # -- phase 4: decode (jpeggpu.h:102-109) --
    def decode(self, *, with_idct: bool = True, device: bool = False,
               donate: bool = False) -> List:
        """Run the device pipeline; returns per-component planes (uint8,
        cropped to component sizes — planar, possibly subsampled, exactly
        like the reference output contract jpeggpu.h:95-100).

        With ``device=True`` the planes are returned as ``jax.Array``s with
        NO host synchronization — the call returns as soon as the execution
        is dispatched, and results materialize only when read (or
        ``block_until_ready``). This restores the reference's stream-ordered,
        no-hidden-sync contract (jpeggpu.h:90-109, README.md:8): decoded
        planes can be chained into further device work without a D2H round
        trip. The default ``device=False`` materializes numpy arrays (one
        blocking D2H, the example-tool idiom).

        With ``donate=True`` the staged device input buffers (scan words,
        segment tables) are donated to the executable, letting XLA reuse
        them in place for temporaries — the analog of the reference's
        caller-owned, decode-consumed d_tmp buffer. The staged inputs are
        invalid afterwards; the next decode restages (call ``transfer``).
        """
        plan = self._require_plan()
        inputs = self._host_inputs()
        if self._device_inputs is None:
            self.transfer()
        for s, scan in enumerate(plan.stream.scans):
            self._log(f"scan {s}: {scan.num_subsequences} subsequences in "
                      f"{scan.num_segments} segment(s), "
                      f"{scan.num_mcus_x}x{scan.num_mcus_y} MCUs")
        exe = get_compiled(plan, inputs, with_idct, donate=donate)
        dev = self._device_inputs
        if donate:
            self._device_inputs = None  # donated buffers are consumed
        out = exe(dev["scans"], dev["qtables"])
        if device:
            return list(out)
        planes = [np.asarray(p) for p in out]
        from . import debug

        if debug.is_debug():
            self._debug_checks(planes, with_idct)
        return planes

    def decode_into(self, outs: Sequence, *, with_idct: bool = True) -> List:
        """Decode into caller-owned, reusable device output buffers.

        The analog of the reference's output contract: decode() writes each
        component plane into user-provided device memory whose row pitch may
        exceed the component width (jpeggpu.h:95-100; pointer/pitch
        validation at decoder.cpp:336-353). ``outs`` is one ``jax.Array``
        per component, each at least ``(size_y, size_x)`` — larger extents
        are the pitch: the decoded plane lands in the top-left corner and
        all bytes past it are preserved, exactly like the reference leaves
        row tails untouched.

        The buffers are DONATED: XLA aliases each output to the caller's
        buffer, so the decode allocates no output memory and the returned
        arrays occupy the same device buffers — pass them back in to decode
        the next image into the same memory (the JAX ownership model makes
        the *handle* single-use where the reference reuses a raw pointer;
        the memory is reused identically). The old handles are invalid
        after the call.
        """
        import jax

        plan = self._require_plan()
        comps = plan.stream.components
        if len(outs) != len(comps):
            raise InvalidArgument(
                f"expected {len(comps)} output planes, got {len(outs)}")
        want = np.uint8 if with_idct else np.int16
        for i, (o, c) in enumerate(zip(outs, comps)):
            if not isinstance(o, jax.Array):
                raise InvalidArgument(
                    f"output plane {i} must be a jax.Array (device memory)")
            if o.ndim != 2 or o.shape[0] < c.size_y or o.shape[1] < c.size_x:
                raise InvalidArgument(
                    f"output plane {i} shape {o.shape} is smaller than the "
                    f"component ({c.size_y}, {c.size_x}) — pitch must be >= "
                    f"width (decoder.cpp:345-352)")
            if o.dtype != want:
                raise InvalidArgument(
                    f"output plane {i} dtype {o.dtype} != {np.dtype(want)}")
        inputs = self._host_inputs()
        if self._device_inputs is None:
            self.transfer()
        from .pipeline import get_compiled_into

        exe = get_compiled_into(plan, inputs, outs, with_idct)
        dev = self._device_inputs
        return list(exe(dev["scans"], dev["qtables"], tuple(outs)))

    def _debug_checks(self, planes, with_idct: bool) -> None:
        """Synchronous consistency checks (reference is_debug analog)."""
        from . import debug
        from .errors import InternalError

        plan = self._require_plan()
        stream = plan.stream
        for scan in stream.scans:
            seg = scan.segments
            if int(seg[:, 1].sum()) != scan.num_subsequences or (
                    scan.num_segments and
                    not (seg[1:, 0] == np.cumsum(seg[:-1, 1])).all()):
                raise InternalError("segment table inconsistent")
        self._log("debug: segment tables consistent")
        self._destuff_cross_check()
        npix = stream.size_x * stream.size_y
        if with_idct and npix <= debug.DEBUG_GOLDEN_MAX_PIXELS:
            from . import golden

            ref = golden.decode(self._data)
            for i, (a, b) in enumerate(zip(ref, planes)):
                if not np.array_equal(a, b):
                    raise InternalError(
                        f"device output diverges from golden CPU decode "
                        f"(plane {i})")
            self._log("debug: device output matches golden CPU decoder")
        if npix <= debug.DEBUG_GOLDEN_MAX_PIXELS:
            self._sync_invariant_checks()

    def _destuff_cross_check(self) -> None:
        """If the plan uses device-side destuffing, synchronously compare
        its output words against the host destuffer — the analog of the
        reference's is_debug checks that D2H-verify the GPU destuff against
        the host parser (decode_destuff.cu:242-253, :328-341)."""
        import jax

        from .errors import InternalError
        from .ops.destuff import destuff_scan
        from .pipeline import _destuff_host

        plan = self._require_plan()
        inputs = self._host_inputs()
        buf = np.frombuffer(self._data, np.uint8)
        for si, (scan, sp) in enumerate(
                zip(plan.stream.scans, plan.signature.scans)):
            if sp.host_destuff:
                continue
            inp = inputs["scans"][si]
            dev = np.asarray(jax.jit(destuff_scan, static_argnums=2)(
                inp["raw"], inp["seg_sub_offset"], sp.cfg.lanes))
            host = _destuff_host(buf, scan, sp.cfg.lanes)
            if not np.array_equal(dev, host):
                bad = int(np.flatnonzero(dev != host)[0])
                raise InternalError(
                    f"device destuff diverges from host destuffer "
                    f"(scan {si}, first word {bad}: device "
                    f"{dev[bad]:#010x} != host {host[bad]:#010x})")
            self._log(f"debug: scan {si} device destuff matches host")

    def _sync_invariant_checks(self) -> None:
        """Numeric-invariant sanitizer over the converged decoder states —
        the TPU analog of the reference's routine compute-sanitizer runs
        (decoder.cpp:248-251's zero-inits exist only to satisfy initcheck).
        For every scan, re-derives the Jacobi-synced per-subsequence states
        and asserts the structural invariants any correct synchronization
        must satisfy: bit positions end inside the owning subsequence's
        window and never regress along a segment, the component counter
        stays inside the MCU, the zig-zag index stays inside the data unit,
        and symbol counts are non-negative. (checkify index_checks cannot
        be used wholesale: the masking idiom on TPU is deliberate
        out-of-bounds scatter indices with mode="drop".)"""
        import jax

        from . import constants as C
        from .errors import InternalError
        from .ops import huffman as H

        plan = self._require_plan()
        inputs = self._host_inputs()
        for si, sp in enumerate(plan.signature.scans):
            cfg = sp.cfg
            inp = inputs["scans"][si]

            def f(i, cfg=cfg, sp=sp):
                if sp.host_destuff:
                    words = i["words"]
                else:
                    from .ops.destuff import destuff_scan

                    words = destuff_scan(i["raw"], i["seg_sub_offset"],
                                         cfg.lanes)
                arrs = H.ScanArrays(
                    words=words, seg_of_subseq=i["seg_of_subseq"],
                    seg_first_lane=i["seg_first_lane"],
                    seg_num_subseq=i["seg_num_subseq"],
                    maxcode=i["maxcode"], vsm=i["vsm"],
                    huffval=i["huffval"])
                ctx = H.make_ctx(cfg, arrs)
                p, c, z, n = H.sync_states(cfg, arrs, ctx)
                return p, c, z, n, ctx.rel, ctx.lane_valid

            p, c, z, n, rel, valid = (np.asarray(x) for x in jax.jit(f)(inp))
            p, c, z, n, rel = (a[valid] for a in (p, c, z, n, rel))
            end = (rel + 1) * C.SUBSEQ_SIZE_BITS
            bad = []
            if not ((p >= 0) & (p <= end)).all():
                bad.append("bit position outside subsequence window")
            if not ((c >= 0) & (c < cfg.du_per_mcu)).all():
                bad.append("component counter outside MCU")
            if not ((z >= 0) & (z < 64)).all():
                bad.append("zig-zag index outside data unit")
            if not (n >= 0).all():
                bad.append("negative symbol count")
            if bad:
                raise InternalError(
                    f"sync-state invariants violated (scan {si}): "
                    + "; ".join(bad))
        self._log("debug: sync-state numeric invariants hold")

    def decode_rgb(self) -> np.ndarray:
        """Convenience: decode + chroma upsample + YCbCr->RGB (host side,
        mirroring example/example_tool.c + util/util.h)."""
        planes = self.decode()
        stream = self._require_plan().stream
        sampling = [(c.ss_x, c.ss_y) for c in stream.components]
        return to_rgb(planes, sampling)

    # -- phase 5: cleanup (jpeggpu.h:57-58) --
    def cleanup(self) -> None:
        self._plan = None
        self._data = None
        self._staged = None
        self._device_inputs = None

    def __enter__(self) -> "Decoder":
        return self

    def __exit__(self, *exc) -> None:
        self.cleanup()


def is_css_444(subsampling: Sequence[Tuple[int, int]],
               num_components: int) -> bool:
    """True iff every component is 1x1 sampled (reference is_css_444,
    jpeggpu.h:70-71)."""
    return all(subsampling[c] == (1, 1) for c in range(num_components))


def decode(data: bytes) -> List[np.ndarray]:
    """One-shot decode to planar components."""
    with Decoder() as d:
        d.parse_header(data)
        return d.decode()


def decode_rgb(data: bytes) -> np.ndarray:
    """One-shot decode to interleaved RGB."""
    with Decoder() as d:
        d.parse_header(data)
        return d.decode_rgb()
