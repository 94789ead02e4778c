"""Device dequantize + integer IDCT.

Two implementations with identical integer semantics (bit-identical to the
golden CPU path by construction):
- the portable XLA formulation (shared arithmetic from
  :mod:`jpeggpu_tpu.idct_int`),
- a fused Pallas TPU kernel (:mod:`jpeggpu_tpu.ops.idct_pallas`),
  selected automatically on TPU backends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..idct_int import dequant_idct_blocks


def _use_pallas() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def dequant_idct_plane(plane: jax.Array, qtable: jax.Array) -> jax.Array:
    """IDCT a coefficient plane into uint8 pixels.

    Args:
      plane: int16[(H, W)] coefficient raster, H and W multiples of 8.
      qtable: raw DQT bytes, natural order, shape (64,), any int dtype.

    Returns uint8[(H, W)].
    """
    h, w = plane.shape
    blocks = plane.astype(jnp.int32).reshape(h // 8, 8, w // 8, 8)
    blocks = blocks.transpose(0, 2, 1, 3)
    if _use_pallas():
        from .idct_pallas import dequant_idct_blocks_pallas

        pix = dequant_idct_blocks_pallas(
            blocks.reshape(-1, 8, 8), qtable.astype(jnp.int32))
        pix = pix.reshape(h // 8, w // 8, 8, 8)
    else:
        pix = dequant_idct_blocks(jnp, blocks, qtable.astype(jnp.int32))
    out = pix.transpose(0, 2, 1, 3).reshape(h, w)
    return out.astype(jnp.uint8)
