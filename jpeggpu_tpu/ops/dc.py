"""DC un-delta: segmented inclusive prefix-sum over the DC slots.

XLA recast of the CUB InclusiveSum(ByKey) over stride-64 permutation
iterators (src/decode_dc.cu:88-169): per scan component, a masked cumsum in
stream order with per-restart-segment reset; int16 wraparound semantics are
preserved (the reference accumulates in int16).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .. import constants as C
from .huffman import ScanConfig


def undelta_dc(cfg: ScanConfig, comp_slots, coeffs: jax.Array) -> jax.Array:
    """Undo DC difference coding in stream order.

    Args:
      cfg: scan geometry.
      comp_slots: static list of (off_in_mcu, du_per_mcu) per scan component.
      coeffs: int16[total_positions] stream-order coefficients.

    Returns updated coefficients.
    """
    total_du = cfg.total_mcus * cfg.du_per_mcu
    arr = coeffs.reshape(total_du, C.DATA_UNIT_SIZE)
    dc = arr[:, 0].astype(jnp.int32)
    slot = jnp.arange(total_du, dtype=jnp.int32) % cfg.du_per_mcu
    seg_du = cfg.mcus_per_seg * cfg.du_per_mcu
    nseg = -(-total_du // seg_du)
    pad = nseg * seg_du - total_du

    new_dc = dc
    for off, cnt in comp_slots:
        sel = (slot >= off) & (slot < off + cnt)
        x = jnp.where(sel, dc, 0)
        # segment reset by construction: one row per restart segment,
        # cumsum along the row (the global-cumsum-minus-gathered-base
        # formulation cost an element-granular gather of the bases)
        xp = jnp.pad(x, (0, pad)) if pad else x
        cum = jnp.cumsum(xp.reshape(nseg, seg_du), axis=1)
        cum = cum.reshape(-1)[:total_du] if pad else cum.reshape(-1)
        new_dc = jnp.where(sel, cum, new_dc)

    # int16 wrap like the reference's int16 scan
    wrapped = ((new_dc + 0x8000) & 0xFFFF) - 0x8000
    return arr.at[:, 0].set(wrapped.astype(jnp.int16)).reshape(-1)


def undelta_dc_values(cfg: ScanConfig, comp_slots, coeffs: jax.Array = None,
                      dc: jax.Array = None) -> jax.Array:
    """Un-deltaed DC values alone: int16[total_du].

    Same arithmetic as :func:`undelta_dc` but returns just the DC vector
    instead of rewriting the whole coefficient stream — the fused IDCT
    kernel overrides slot 0 from this side input, which saves the
    full-stream copy the ``.at[:, 0].set`` costs (37 MB on a 12 MP image).

    ``dc``, if given, is the per-data-unit difference-coded DC vector
    (int16[>= total_du], e.g. the tile-assembly side output) and
    ``coeffs`` is not touched — skipping the strided slot-0 extraction
    that re-reads the whole coefficient stream (profiled ~1.2 ms at
    12 MP).

    The segmented cumsum runs on a lane-aligned 2D fold: ``g`` whole
    segments per row with ``128 | g*seg_du`` (so the fold reshape is a
    free sublane repack, where the naive (nseg, seg_du) fold relayouts
    at ~2.7 GB/s), segment resets applied by subtracting each segment's
    row-prefix — int32 wraparound keeps every step congruent mod 2^16,
    which is all the final int16 wrap needs.
    """
    total_du = cfg.total_mcus * cfg.du_per_mcu
    if dc is not None:
        dc32 = dc[:total_du].astype(jnp.int32)
    else:
        dc32 = coeffs.reshape(
            total_du, C.DATA_UNIT_SIZE)[:, 0].astype(jnp.int32)
    seg_du = cfg.mcus_per_seg * cfg.du_per_mcu
    nseg = -(-total_du // seg_du)

    g = 128 // math.gcd(seg_du, 128)
    if nseg >= g:
        return _dcv_aligned(cfg, comp_slots, dc32, total_du, seg_du, nseg,
                            g)

    # few-segment fallback (small images): the padding waste of the
    # aligned fold would exceed the work it saves
    slot = jnp.arange(total_du, dtype=jnp.int32) % cfg.du_per_mcu
    pad = nseg * seg_du - total_du
    new_dc = dc32
    for off, cnt in comp_slots:
        sel = (slot >= off) & (slot < off + cnt)
        x = jnp.where(sel, dc32, 0)
        xp = jnp.pad(x, (0, pad)) if pad else x
        cum = jnp.cumsum(xp.reshape(nseg, seg_du), axis=1)
        cum = cum.reshape(-1)[:total_du] if pad else cum.reshape(-1)
        new_dc = jnp.where(sel, cum, new_dc)
    wrapped = ((new_dc + 0x8000) & 0xFFFF) - 0x8000
    return wrapped.astype(jnp.int16)


def _dcv_aligned(cfg: ScanConfig, comp_slots, dc32, total_du, seg_du, nseg,
                 g):
    """Aligned-fold segmented DC cumsum: rows of ``g`` whole segments."""
    row_len = seg_du * g
    rows = -(-nseg // g)
    padded = rows * row_len
    dcp = jnp.pad(dc32, (0, padded - total_du)) if padded > total_du \
        else dc32
    dc2 = dcp.reshape(rows, row_len)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, row_len), 1)
    slot2 = col % cfg.du_per_mcu  # du_per_mcu divides seg_du: row-periodic

    new_dc = dc2
    for off, cnt in comp_slots:
        sel = (slot2 >= off) & (slot2 < off + cnt)
        x2 = jnp.where(sel, dc2, 0)
        c2 = jnp.cumsum(x2, axis=1)
        # segment reset: subtract the row-prefix at each segment's start.
        # ends[:, k] = c2 at the last column of segment k; the per-element
        # base is accumulated with g-1 masked adds of the per-segment
        # deltas (an unaligned repeat/reshape would relayout; a one-hot
        # matmul would need f32, which is not congruent mod 2^16)
        base = c2[:, seg_du - 1::seg_du]  # (rows, g) segment-end prefixes
        # prev[:, k] = row prefix before segment k (0 for the row's first);
        # telescoping masked adds accumulate each element's own-segment
        # prefix: sum_{k<=s(j)} (prev[k] - prev[k-1]) = prev[s(j)]
        prev = jnp.pad(base[:, :-1], ((0, 0), (1, 0)))
        base_elem = jnp.zeros_like(c2)
        for k in range(1, g):
            base_elem = base_elem + jnp.where(
                col >= k * seg_du, prev[:, k:k + 1] - prev[:, k - 1:k], 0)
        new_dc = jnp.where(sel, c2 - base_elem, new_dc)

    wrapped = ((new_dc + 0x8000) & 0xFFFF) - 0x8000
    return wrapped.astype(jnp.int16).reshape(-1)[:total_du]
