"""Pallas TPU kernel: fused dequantize + integer 8x8 IDCT + level shift.

Same arithmetic as :mod:`jpeggpu_tpu.idct_int` (reference src/idct.cu:44-223)
— int16-wrapping dequant, two fixed-point passes, +128/clamp — but fused in
VMEM: a grid cell loads a (8, 8, LANES) tile of coefficient blocks (data
units laid out unit-per-lane), runs both passes fully unrolled on (LANES,)
vectors, and writes uint8-valued pixels without intermediate HBM traffic.

Selected automatically on TPU backends; the XLA formulation remains the
portable fallback (ops/idct.py chooses).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..idct_int import _COS_1_4, _COS_1_8, _OCOS_1_16, _OCOS_5_16, \
    _OSIN_1_16, _OSIN_5_16, _SIN_1_8

LANES = 512  # data units per grid cell


def _wrap16(x):
    return ((x + 0x8000) & 0xFFFF) - 0x8000


def _unfixo(x):
    return (x + 0x1000) >> 13


def _unfixh(x):
    return _wrap16((x + 0x8000) >> 16)


def _vector8(v):
    v0, v1, v2, v3, v4, v5, v6, v7 = v
    t10 = (v0 + v4) * _COS_1_4
    t11 = (v0 - v4) * _COS_1_4
    t12 = v2 * _SIN_1_8 - v6 * _COS_1_8
    t13 = v6 * _SIN_1_8 + v2 * _COS_1_8
    t20, t21 = t10 + t13, t11 + t12
    t22, t23 = t11 - t12, t10 - t13
    t30 = _unfixo((v3 + v5) * _COS_1_4)
    t31 = _unfixo((v3 - v5) * _COS_1_4)
    v1s, v7s = v1 << 2, v7 << 2
    t40, t41 = v1s + t30, v7s + t31
    t42, t43 = v1s - t30, v7s - t31
    t50 = t40 * _OCOS_1_16 + t41 * _OSIN_1_16
    t51 = t40 * _OSIN_1_16 - t41 * _OCOS_1_16
    t52 = t42 * _OCOS_5_16 + t43 * _OSIN_5_16
    t53 = t42 * _OSIN_5_16 - t43 * _OCOS_5_16
    return (_unfixh(t20 + t50), _unfixh(t21 + t53), _unfixh(t22 + t52),
            _unfixh(t23 + t51), _unfixh(t23 - t51), _unfixh(t22 - t52),
            _unfixh(t21 - t53), _unfixh(t20 - t50))


def _idct_kernel(coeff_ref, q_ref, out_ref):
    # coeff_ref: (8, 8, LANES) int32 — [row, col, unit]
    # q_ref:     (8, 8) int32 (already signed-int8 reinterpreted)
    # out_ref:   (8, 8, LANES) int32 pixels in [0, 255]
    x = coeff_ref[...]
    q = q_ref[...]
    dq = _wrap16(x * q[:, :, None])

    # column pass: transform down each column j (along the row axis)
    cols = [[dq[i, j, :] for j in range(8)] for i in range(8)]
    for j in range(8):
        res = _vector8([cols[i][j] for i in range(8)])
        for i in range(8):
            cols[i][j] = res[i]
    # row pass: transform along each row i
    for i in range(8):
        res = _vector8(cols[i])
        cols[i] = list(res)

    rows = [jnp.stack(cols[i], axis=0) for i in range(8)]  # (8, LANES) each
    pix = jnp.stack(rows, axis=0)  # (8, 8, LANES)
    pix = jnp.clip(_wrap16(pix + 128), 0, 255)
    out_ref[...] = pix


def _stream_idct_kernel(gy_n, ssx, ssy, off, with_dc, *refs):
    # coeff_ref: (GY, mx, du_per_mcu, 64) int16 — raw stream-order MCU rows
    # dc_ref:    (GY, mx, du_per_mcu) int16 — un-deltaed DC side input
    #            (present iff with_dc): slot 0 of each unit is overridden
    #            from here, so the DC un-delta never rewrites the stream
    # q_ref:     (8, 8) int32 (signed-int8 reinterpreted)
    # lo/hi_ref: (GY*ssy*8, mx*ssx) int32 — pixels j=0..3 / j=4..7 of each
    #            unit byte-packed little-endian (Mosaic has no (u, 8)->(8u)
    #            interleave; the byte lanes provide it for free)
    if with_dc:
        coeff_ref, dc_ref, q_ref, lo_ref, hi_ref = refs
    else:
        coeff_ref, q_ref, lo_ref, hi_ref = refs
        dc_ref = None
    q = q_ref[...]
    mx = coeff_ref.shape[1]
    u = mx * ssx
    for gy in range(gy_n):
        for sy in range(ssy):
            lo = off + sy * ssx
            x = coeff_ref[gy, :, lo:lo + ssx, :]  # (mx, ssx, 64)
            if dc_ref is not None:
                # splice the un-deltaed DC into slot 0 BEFORE the (u, 64)
                # merge: reshaping the (mx, ssx) DC slice to (u,) directly
                # is a minor-dim interleave Mosaic cannot shape-cast; the
                # trailing singleton comes in from XLA (in-kernel minor-dim
                # insertion is 32-bit-only in Mosaic)
                dcb = dc_ref[gy, :, lo:lo + ssx, :]  # (mx, ssx, 1)
                x = jnp.concatenate([dcb, x[:, :, 1:]], axis=-1)
            # unit order (mcu, sx) == plane x order; zig-zag already undone
            xt = x.reshape(u, 64).astype(jnp.int32).T  # (64, u)
            dq = _wrap16(xt.reshape(8, 8, u) * q[:, :, None])
            cols = [[dq[i, j, :] for j in range(8)] for i in range(8)]
            for j in range(8):
                res = _vector8([cols[i][j] for i in range(8)])
                for i in range(8):
                    cols[i][j] = res[i]
            for i in range(8):
                cols[i] = list(_vector8(cols[i]))
            r0 = (gy * ssy + sy) * 8
            for i in range(8):
                b = [jnp.clip(_wrap16(cols[i][j] + 128), 0, 255)
                     for j in range(8)]
                lo_ref[r0 + i, :] = (b[0] | (b[1] << 8) | (b[2] << 16)
                                     | (b[3] << 24))
                hi_ref[r0 + i, :] = (b[4] | (b[5] << 8) | (b[6] << 16)
                                     | (b[7] << 24))


def idct_stream_to_plane(coeffs: jax.Array, qtable: jax.Array,
                         num_mcus_x: int, num_mcus_y: int, du_per_mcu: int,
                         off: int, ssx: int, ssy: int,
                         dc_override: jax.Array | None = None) -> jax.Array:
    """Fused de-interleave + dequant + IDCT: stream-order coefficients
    straight to a component's uint8 pixel plane.

    Replaces the XLA 6D coefficient transpose (ops/transpose.py) + blocked
    IDCT for interleaved scans: each grid step reads a strip of raw MCU
    rows (block index map does the de-interleave addressing), statically
    slices its component, and writes dense plane rows — the whole tail in
    one VMEM pass. The reference needs two separate kernels for this
    (decode_transpose.cu:41-132 scatter + idct.cu:44-223).

    Args:
      coeffs: int16[num_mcus * du_per_mcu * 64] natural-order stream
        (post DC un-delta, or raw-DC with ``dc_override``).
      qtable: raw DQT bytes, natural order, (64,).
      dc_override: optional int16[num_mcus * du_per_mcu] of un-deltaed DC
        values (ops.dc.undelta_dc_values); slot 0 of each data unit reads
        from here instead of the stream, so the DC stage never rewrites
        the 2-byte-per-position coefficient buffer.
    Returns uint8[(num_mcus_y*ssy*8, num_mcus_x*ssx*8)].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = coeffs.reshape(num_mcus_y, num_mcus_x, du_per_mcu, 64)
    q = qtable.reshape(8, 8).astype(jnp.int32)
    q = ((q + 0x80) & 0xFF) - 0x80  # signed-int8 quirk (idct.cu:179)

    gy_n = next((g for g in (8, 4, 2, 1) if num_mcus_y % g == 0), 1)
    h = num_mcus_y * ssy * 8
    u = num_mcus_x * ssx
    word_spec = pl.BlockSpec((gy_n * ssy * 8, u), lambda g: (g, 0),
                             memory_space=pltpu.VMEM)
    with_dc = dc_override is not None
    ins = [x]
    in_specs = [pl.BlockSpec((gy_n, num_mcus_x, du_per_mcu, 64),
                             lambda g: (g, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    if with_dc:
        ins.append(dc_override.reshape(num_mcus_y, num_mcus_x, du_per_mcu,
                                       1))
        in_specs.append(pl.BlockSpec((gy_n, num_mcus_x, du_per_mcu, 1),
                                     lambda g: (g, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
    ins.append(q)
    in_specs.append(pl.BlockSpec((8, 8), lambda g: (0, 0),
                                 memory_space=pltpu.VMEM))
    lo, hi = pl.pallas_call(
        partial(_stream_idct_kernel, gy_n, ssx, ssy, off, with_dc),
        grid=(num_mcus_y // gy_n,),
        in_specs=in_specs,
        out_specs=[word_spec, word_spec],
        out_shape=[jax.ShapeDtypeStruct((h, u), jnp.int32)] * 2,
        # wide images (26 MP: 390 MCU columns/block) push the kernel's
        # scoped temporaries past Mosaic's default 16 MiB vmem budget
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(*ins)
    # interleave the lo/hi words per unit, then let the byte lanes fan out:
    # (h, u, 2) int32 -> (h, u, 2, 4) uint8 == (h, u*8) plane rows
    words = jnp.stack([lo, hi], axis=-1)
    pix = jax.lax.bitcast_convert_type(words, jnp.uint8)
    return pix.reshape(h, u * 8)


# A "planar-major" IDCT variant (ONE XLA transpose to slot-major
# (64, rows, cols), then full (8, cols)-tile kernel ops at 8x the sublane
# utilization of the strip kernel above) was built and measured on v5e
# 2026-08-20: the XLA de-interleave transpose dominates (6.45 ms vs 0.56 ms
# for the strip kernel on the 12 MP bench), so the strip kernel's
# block-index-map addressing is the right trade. Don't revisit without
# fixing the transpose first (e.g. a transposed assembly output).


def dequant_idct_blocks_pallas(coeffs: jax.Array, qtable: jax.Array) -> jax.Array:
    """coeffs: int32[N, 8, 8] natural order; qtable raw bytes (64,)/(8,8).

    Returns int32[N, 8, 8] pixels in [0, 255]. N is padded to LANES
    internally.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = coeffs.shape[0]
    n_pad = -(-n // LANES) * LANES
    x = jnp.zeros((n_pad, 8, 8), jnp.int32).at[:n].set(coeffs)
    x = jnp.transpose(x, (1, 2, 0))  # (8, 8, N)

    q = qtable.reshape(8, 8).astype(jnp.int32)
    q = ((q + 0x80) & 0xFF) - 0x80  # signed-int8 quirk (idct.cu:179)

    grid = (n_pad // LANES,)
    out = pl.pallas_call(
        _idct_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 8, n_pad), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, 8, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 8, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
    )(x, q)
    return jnp.transpose(out, (2, 0, 1))[:n]
