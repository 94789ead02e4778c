"""DC un-delta: segmented inclusive prefix-sum over the DC slots.

XLA recast of the CUB InclusiveSum(ByKey) over stride-64 permutation
iterators (src/decode_dc.cu:88-169): per scan component, a masked cumsum in
stream order with per-restart-segment reset; int16 wraparound semantics are
preserved (the reference accumulates in int16).
"""

from __future__ import annotations

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


def undelta_dc_values(cfg: ScanConfig, comp_slots, coeffs: jax.Array
                      ) -> jax.Array:
    """Un-deltaed DC values alone: int16[total_du].

    Same arithmetic as :func:`undelta_dc` but returns just the DC vector
    instead of rewriting the whole coefficient stream — the fused IDCT
    kernel overrides slot 0 from this side input, which saves the
    full-stream copy the ``.at[:, 0].set`` costs (37 MB on a 12 MP image).
    """
    total_du = cfg.total_mcus * cfg.du_per_mcu
    dc = coeffs.reshape(total_du, C.DATA_UNIT_SIZE)[:, 0].astype(jnp.int32)
    slot = jnp.arange(total_du, dtype=jnp.int32) % cfg.du_per_mcu
    seg_du = cfg.mcus_per_seg * cfg.du_per_mcu
    nseg = -(-total_du // seg_du)
    pad = nseg * seg_du - total_du

    new_dc = dc
    for off, cnt in comp_slots:
        sel = (slot >= off) & (slot < off + cnt)
        x = jnp.where(sel, dc, 0)
        xp = jnp.pad(x, (0, pad)) if pad else x
        cum = jnp.cumsum(xp.reshape(nseg, seg_du), axis=1)
        cum = cum.reshape(-1)[:total_du] if pad else cum.reshape(-1)
        new_dc = jnp.where(sel, cum, new_dc)
    wrapped = ((new_dc + 0x8000) & 0xFFFF) - 0x8000
    return wrapped.astype(jnp.int16)
