"""De-interleave: stream-order coefficients -> per-component planar rasters.

The reference does this with a scatter kernel (src/decode_transpose.cu:41-132)
because CUDA threads must write "random" addresses; on TPU the whole mapping
is a pure reshape/transpose chain that XLA lowers to layout copies — no
gather or scatter at all.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from .. import constants as C
from .huffman import ScanConfig


def deinterleave(cfg: ScanConfig, coeffs: jax.Array, num_mcus_x: int,
                 num_mcus_y: int,
                 comps: List[Tuple[int, int, int, int]]) -> List[jax.Array]:
    """Split stream-order coefficients into planar component rasters.

    Args:
      coeffs: int16[total_positions].
      comps: static per scan component (off_in_mcu, ss_x, ss_y) + data sizes
        as (off_in_mcu, ss_x, ss_y) tuples... see pipeline for packing:
        (off_in_mcu, ss_x, ss_y, _unused).

    Returns int16[(data_size_y, data_size_x)] per scan component.
    """
    arr = coeffs.reshape(num_mcus_y * num_mcus_x, cfg.du_per_mcu,
                         C.DATA_UNIT_SIZE)
    planes = []
    for off, ssx, ssy, _ in comps:
        part = arr[:, off:off + ssx * ssy, :]
        part = part.reshape(num_mcus_y, num_mcus_x, ssy, ssx, 8, 8)
        plane = part.transpose(0, 2, 4, 1, 3, 5).reshape(
            num_mcus_y * ssy * 8, num_mcus_x * ssx * 8)
        planes.append(plane)
    return planes
