"""Device dequantize + integer IDCT.

Runs the shared fixed-point arithmetic of :mod:`jpeggpu_tpu.idct_int` under
XLA on (n_blocks, 8, 8) int32 tensors — bit-identical to the golden CPU path
by construction. A Pallas fused variant lives in
:mod:`jpeggpu_tpu.ops.idct_pallas`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..idct_int import dequant_idct_blocks


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
    pix = dequant_idct_blocks(jnp, blocks, qtable.astype(jnp.int32))
    out = pix.transpose(0, 2, 1, 3).reshape(h, w)
    return out.astype(jnp.uint8)
