"""Device destuffing: remove 0xFF00 stuffing and restart markers, compact
each restart segment into subsequence-aligned (128-byte, zero padded) form.

XLA formulation of the reference's three-map/three-scan pipeline
(src/decode_destuff.cu:152-361): per-byte classification + prefix sums; the
per-segment data base is obtained with a running cummax instead of a
scan-by-key, and the compacted write is a single scatter with monotonically
increasing destinations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C


def destuff_scan(scan_bytes: jax.Array, seg_sub_offset: jax.Array,
                 num_subseq_padded: int) -> jax.Array:
    """Destuff one scan's raw entropy bytes into decode layout.

    Args:
      scan_bytes: uint8[scan_size] raw (stuffed) scan body.
      seg_sub_offset: int32[num_segments] subsequence offset per segment
        (host-parsed, same data the reference transfers, decoder.cpp:201-208).
      num_subseq_padded: padded subsequence count (output words size).

    Returns:
      uint32[num_subseq_padded * 32] big-endian words of destuffed data;
      segment s occupies words [seg_sub_offset[s]*32, ...), zero padded.
    """
    b = scan_bytes
    n = b.shape[0]
    prev_is_ff = jnp.concatenate([jnp.zeros(1, jnp.bool_), b[:-1] == 0xFF])
    is_data = (prev_is_ff & (b == 0)) | (~prev_is_ff & (b != 0xFF))
    byte_write = jnp.where(prev_is_ff, jnp.uint8(0xFF), b)
    is_rst_2nd = prev_is_ff & (b >= C.MARKER_RST0) & (b <= C.MARKER_RST7)

    seg_id = jnp.cumsum(is_rst_2nd.astype(jnp.int32))
    data_cum = jnp.cumsum(is_data.astype(jnp.int32))  # inclusive
    # data bytes before the current segment: data_cum at the most recent
    # restart-marker byte (is_data is false there, so data_cum == "before")
    seg_base = jax.lax.cummax(jnp.where(is_rst_2nd, data_cum, 0))
    idx_in_seg = data_cum - 1 - seg_base

    nseg = seg_sub_offset.shape[0]
    sub_off = jnp.take(seg_sub_offset, jnp.clip(seg_id, 0, nseg - 1))
    dst = sub_off * C.SUBSEQ_SIZE_BYTES + idx_in_seg
    total = num_subseq_padded * C.SUBSEQ_SIZE_BYTES
    dst = jnp.where(is_data & (dst < total), dst, total)

    out = jnp.zeros(total + 1, jnp.uint8)
    out = out.at[dst].set(byte_write, mode="drop", unique_indices=False)
    out = out[:total]

    # pack big-endian 32-bit words
    quads = out.reshape(-1, 4).astype(jnp.uint32)
    words = (quads[:, 0] << 24) | (quads[:, 1] << 16) | (quads[:, 2] << 8) | quads[:, 3]
    return words
