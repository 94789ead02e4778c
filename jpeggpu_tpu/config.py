"""Typed decode-tuning configuration (SURVEY §5 config/flag system).

The reference hard-codes its tuning in kernel-launch constants
(decode_huffman.cu: block sizes 256/512, chunk sizes); here every knob of
the device entropy decoder lives in one frozen dataclass that rides inside
the static :class:`~jpeggpu_tpu.ops.huffman.ScanConfig`, so a tuning change
is part of the executable cache key and triggers exactly one recompile.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Tuning:
    """Static tuning knobs of the device entropy decoder.

    Attributes:
      frontier_width: lane count of compacted synchronization rounds; a
        mis-synced frontier wider than this falls back to a full-width round
        (ops/huffman.py sync_states).
      write_chunk: symbol steps per writing-decode round between coefficient
        scatters (ops/huffman.py decode_write).
      straggler_width: lane count of the compacted tail of the writing
        decode, entered once fewer than this many lanes remain active.
      unroll: symbol decodes per loop iteration (one rolling bit-buffer
        refill each); amortizes per-iteration fixed costs. 0 selects 16 on
        TPU backends (measured best) and 8 elsewhere (CPU pays the body
        size in compile time).
      chain_follow: subsequences re-decoded per chain per compacted
        synchronization round. A mis-synced chain drains one subsequence
        per Jacobi round; following the chain F-deep inside one round
        (Gauss-Seidel within the chain, Jacobi across chains) divides the
        sequential round count by F at the cost of F narrow passes per
        round. 1 restores plain per-subsequence rounds; 0 selects 4 on
        TPU backends and 1 elsewhere (the converged states are identical
        — this is purely a round-count/compile-time trade).
      head_width: chain-head capacity of the narrow chain-follow tier.
        Synchronization enters this tier once fewer than this many chains
        survive; until then the wide tier advances up to frontier_width
        chains per round (at depth wide_follow). Larger values enter the
        narrow tier earlier (fewer wide rounds, wider follow rounds).
        0 selects frontier_width // chain_follow (one context-gather's
        worth of work per follow round).
      wide_follow: chain-follow depth of the wide tier (the rounds between
        the last full-width round and the narrow head tier). 1 advances
        each chain one subsequence per wide round; larger values multiply
        per-round pass work by the same factor but divide the wide round
        count. 0 selects 1.
      tail_width: chain-head capacity of the final tail tier. Once fewer
        than this many chains survive the narrow tier, rounds shrink to
        this width at depth tail_follow — the last few chains (the 12 MP
        bench spends ~6 rounds fixing <10 lanes each) drain on the
        narrowest possible rounds. 0 selects 64; values >= head_width
        disable the tier.
      tail_follow: chain-follow depth of the tail tier. 0 selects 4.
      entropy_backend: "auto" | "xla" | "pallas" — implementation of the
        per-symbol decode loops. "auto" selects the fused Pallas kernels on
        TPU backends and the XLA formulation elsewhere.
      write_mode: "auto" | "scatter" | "matmul" | "tiles" | "fused" —
        coefficient materialization. "scatter" is the element-granular
        scatter of decode_write; "matmul" is the dense-emission + all-XLA
        one-hot assembly (decode_write_emit/assemble_coefficients);
        "tiles" is the dense-emission + Pallas MXU tile-assembly path
        (ops/write_pallas.py) with zero scatters on the hot path; "fused"
        is the single fused Pallas write kernel (ops/huffman_pallas.py).
        "auto" selects tiles on TPU backends, scatter on CPU.
      tile_dot: "auto" | "f32" | "bf16" | "int8" — operand dtype of the
        tile-assembly one-hot MXU contractions (ops/write_pallas.py). The
        f32 dot streams contraction rows at the MXU's multi-pass f32 rate;
        the narrow modes build the one-hot operands natively in the narrow
        dtype (no post-build relayout) and split the coefficient value
        into lo/hi byte planes contracted separately, which is exact:
        every output cell receives at most one term, byte planes span
        [-128, 255] (exact in bf16's 8-bit significand; int8 wraps are
        unwrapped after the dot). "auto" selects f32: measured on v5e
        (2026-08-18), Mosaic rejects *batched* dot_general with narrow
        operands (bf16/int8 compile-fail; unbatched narrow dots and the
        batched f32 dot lower fine), and the stage is bound by the VPU
        one-hot build anyway (BENCH.md), so the narrow modes remain
        CPU/interpret-only test paths.
      tile_mode: "auto" | "lane" | "super" — shape of the tile-assembly
        stage-1 contraction (ops/write_pallas.py). "lane" builds one
        (tile_d, 64) tile per lane with per-lane batched dots — Mosaic
        lowers the batch as ~lanes tiny sequential MXU ops (13.7 ms on the
        12 MP bench, v5e 2026-08-19). "super" groups super_g consecutive
        lanes into one (128, 64) supertile per group and contracts all
        G*128 record slots of a round in ONE unbatched dot pair
        (byte-plane bf16, exact: every cell receives at most one record,
        byte planes are 8-bit so bf16 holds them; measured 3.71 ms, 3.7x).
        "auto" selects super everywhere (interpret-validated on CPU).
      hv_lookup: "auto" | "onehot" | "tree" — formulation of the symbol
        loop's huffval byte lookup. "tree" runs a binary select tree per
        distinct table slot sized to that table's static word count
        (~3x less VPU row work per symbol); "onehot" blends per-lane
        table rows and one-hot-sums them (fewer, larger ops: ~3x cheaper
        to trace/compile). Bit-identical results; "auto" selects tree on
        non-CPU backends (timing evidence: v5e 2026-08-18: sync pass 14.96 ->
        9.38 ms alone, 5.42 ms with bsearch+shift) and onehot on CPU.
      category: "auto" | "mask" | "bsearch" — formulation of the
        canonical-limit code-length decode. "mask" blends per-lane limit
        rows and popcounts 15 comparisons; "bsearch" runs a branchless
        4-step lower-bound per distinct table slot with the vsm offset
        looked up on the same decision bits (~1.5x fewer vector rows).
        Bit-identical results; "auto" selects bsearch on non-CPU backends
        (timing evidence: v5e 2026-08-18) and mask on CPU.
      refill: "auto" | "onehot" | "shift" — formulation of the rolling
        bit-buffer refill. "onehot" sums 8 one-hot row selections of the
        34-word window; "shift" shifts the window rows down by the
        per-lane offset with a 6-step conditional row-shift tree (~4x
        fewer vector rows). Bit-identical results; "auto" selects shift
        on non-CPU backends (timing evidence: v5e 2026-08-18: neutral alone,
        but the tree+bsearch+shift combination reaches 5.42 ms sync vs
        14.96 base) and onehot on CPU.
    """

    # 0 = auto: the 2048-lane compacted tiers. (A no-compaction full-width
    # Jacobi mode exists — sync_states(frontier_width=0) — and was
    # measured SLOWER on v5e 2026-08-20: a full masked round costs
    # ~0.65 ms regardless of frontier size, so 15 Jacobi rounds lose to
    # the tiers' 6.6 ms; see ops/huffman.py _resolve_frontier_width.)
    frontier_width: int = 0
    write_chunk: int = 256
    # static record-slot trim of the supertile assembly prep
    # (ops/write_pallas.py assemble_supertiles): the emit buffer is sized
    # for the 1-bit-code worst case (~1280 slots) but real content fills
    # ~250, so the interleave/prep would move 2.5-5x dead slots; lanes
    # whose count exceeds the trim drain through the leftover scatter, so
    # exactness never depends on it. Multiple of 128 (whole MXU rounds).
    # 256 covers the bench image's max (246) and measured fastest on v5e
    # (2026-08-20: 5.89 ms vs 6.93 at 512 with int8 dots); content with
    # more records per subsequence falls back to the leftover path.
    s_trim: int = 256
    straggler_width: int = 4096
    unroll: int = 0
    chain_follow: int = 0
    head_width: int = 0
    wide_follow: int = 0
    tail_width: int = 0
    tail_follow: int = 0
    # shape of the compacted synchronization tiers (ops/huffman.py
    # _resolve_sync_tiers): "ladder" = one tier per halving width from
    # frontier_width down to ~64 (matches the frontier's per-round decay);
    # "classic" = the wide/narrow/tail structure. "auto" = ladder on
    # non-CPU backends.
    sync_tiers: str = "auto"
    entropy_backend: str = "auto"
    write_mode: str = "auto"
    tile_dot: str = "auto"
    tile_mode: str = "auto"
    hv_lookup: str = "auto"
    category: str = "auto"
    refill: str = "auto"
    # lane-axis fold of the Pallas symbol-loop kernels: "auto" folds the
    # (lanes,) state vectors to (8, w/8) inside the kernels whenever the
    # shape-generic formulations are active (1D vectors lower to (1, lanes)
    # vregs — one of 8 sublanes useful); "off" keeps the 1D layout
    lane2d: str = "auto"
    # context compaction of the frontier sync rounds (ops/huffman.py
    # make_ctx_gatherer): "take" is the plain XLA column gather of the
    # (34, lanes) window (+6 scalar rows) — ~8 ns per element on XLA:TPU,
    # the dominant cost of a compacted round; "dot" gathers all 40 rows
    # with one int8 byte-plane one-hot matmul on the MXU (exact: one-hot
    # columns select exactly one lane; int32 recombines from the four
    # signed byte planes); "rows" repacks the context as one contiguous
    # (lanes, 40) int32 row matrix built once per decode so a round
    # compacts with a single embedding-style row take — scales to any
    # width. "auto" selects rows on non-CPU backends.
    ctx_gather: str = "auto"
    # expand-kernel dot dtype of the supertile assembly
    # (ops/write_pallas.py resolve_expand_dot): "auto" -> the 2-plane
    # signed-int8 split (single-pass MXU, exact for any per-cell record
    # count); "f32" -> plain f32 dot (exact, multi-pass)
    expand_dot: str = "auto"
    # data units per expand-kernel output group (multiple of 128; 0 = auto,
    # resolved by build_plan — see ScanConfig.group_du)
    group_du: int = 0
    # supertile geometry overrides (0 = auto, resolved by build_plan —
    # see ScanConfig.super_g / ScanConfig.super_d / ScanConfig.super_w):
    # lanes per supertile group, data-unit rows per supertile window, and
    # expand window width in supertiles
    super_g: int = 0
    super_d: int = 0
    super_w: int = 0

    def __post_init__(self):
        if self.entropy_backend not in ("auto", "xla", "pallas"):
            raise ValueError(
                f"entropy_backend must be auto|xla|pallas, "
                f"got {self.entropy_backend!r}")
        if self.write_mode not in ("auto", "scatter", "matmul", "tiles",
                                   "fused"):
            raise ValueError(
                f"write_mode must be auto|scatter|matmul|tiles|fused, "
                f"got {self.write_mode!r}")
        if self.tile_dot not in ("auto", "f32", "bf16", "int8"):
            raise ValueError(
                f"tile_dot must be auto|f32|bf16|int8, got {self.tile_dot!r}")
        if self.tile_mode not in ("auto", "lane", "super"):
            raise ValueError(
                f"tile_mode must be auto|lane|super, got {self.tile_mode!r}")
        if self.hv_lookup not in ("auto", "onehot", "tree"):
            raise ValueError(
                f"hv_lookup must be auto|onehot|tree, got {self.hv_lookup!r}")
        if self.category not in ("auto", "mask", "bsearch"):
            raise ValueError(
                f"category must be auto|mask|bsearch, got {self.category!r}")
        if self.refill not in ("auto", "onehot", "shift"):
            raise ValueError(
                f"refill must be auto|onehot|shift, got {self.refill!r}")
        if self.lane2d not in ("auto", "off"):
            raise ValueError(
                f"lane2d must be auto|off, got {self.lane2d!r}")
        if self.ctx_gather not in ("auto", "take", "dot", "rows"):
            raise ValueError(
                f"ctx_gather must be auto|take|dot|rows, "
                f"got {self.ctx_gather!r}")
        if self.expand_dot not in ("auto", "f32", "int8"):
            raise ValueError(
                f"expand_dot must be auto|f32|int8, got {self.expand_dot!r}")
        if self.group_du < 0 or self.group_du % 128:
            raise ValueError(
                "group_du must be a multiple of 128, or 0 (auto)")
        if self.super_g < 0 or (self.super_g & (self.super_g - 1)):
            raise ValueError("super_g must be a power of two, or 0 (auto)")
        if self.super_d < 0 or self.super_d % 8:
            raise ValueError(
                "super_d must be a multiple of 8, or 0 (auto)")
        if self.super_w < 0:
            raise ValueError("super_w must be >= 0 (0 = auto)")
        for name in ("write_chunk", "straggler_width"):
            if getattr(self, name) <= 0:
                raise ValueError(f"{name} must be positive")
        if self.frontier_width < 0:
            raise ValueError("frontier_width must be >= 0 (0 = auto)")
        if self.s_trim <= 0 or self.s_trim % 128:
            raise ValueError("s_trim must be a positive multiple of 128")
        if self.chain_follow < 0:
            raise ValueError("chain_follow must be >= 0 (0 = auto)")
        if self.head_width < 0:
            raise ValueError("head_width must be >= 0 (0 = auto)")
        if self.wide_follow < 0:
            raise ValueError("wide_follow must be >= 0 (0 = auto)")
        if self.tail_width < 0:
            raise ValueError("tail_width must be >= 0 (0 = auto)")
        if self.tail_follow < 0:
            raise ValueError("tail_follow must be >= 0 (0 = auto)")
        if self.sync_tiers not in ("auto", "classic", "ladder"):
            raise ValueError(
                f"sync_tiers must be auto|classic|ladder, "
                f"got {self.sync_tiers!r}")
        # power-of-two <= 128: keeps every 128-slot assembly-round boundary
        # aligned to a bit-buffer refill, so those slots are never stall
        # holes (ops/huffman.py assemble_coefficients reads slot 0's du);
        # 0 = auto (both auto choices satisfy the constraints)
        if self.unroll < 0 or self.unroll > 128 or \
                (self.unroll & (self.unroll - 1)):
            raise ValueError("unroll must be a power of two <= 128, or 0")
        if self.unroll and self.write_chunk % self.unroll:
            raise ValueError("write_chunk must be a multiple of unroll")


_default = Tuning()


def default_tuning() -> Tuning:
    return _default


def set_default_tuning(tuning: Tuning) -> None:
    """Set the process-wide default tuning used by newly built plans."""
    global _default
    _default = tuning
