"""Unit tests for individual device stages."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from jpeggpu_tpu import constants as C
from jpeggpu_tpu import golden
from jpeggpu_tpu.encoder import EncodeSpec, encode
from jpeggpu_tpu.idct_int import dequant_idct_blocks
from jpeggpu_tpu.ops import huffman as H
from jpeggpu_tpu.ops.destuff import destuff_scan
from jpeggpu_tpu.pipeline import build_inputs, build_plan
from jpeggpu_tpu.reader import parse


def _setup(data, host_destuff=True):
    plan = build_plan(parse(data), host_destuff=host_destuff)
    inputs = build_inputs(data, plan)
    return plan, inputs


def test_destuff_matches_host(test_image):
    data = encode(test_image, EncodeSpec(
        sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=2))
    plan, inputs = _setup(data, host_destuff=False)
    scan = plan.stream.scans[0]
    sp = plan.signature.scans[0]
    inp = inputs["scans"][0]
    words = jax.jit(destuff_scan, static_argnums=(2,))(
        inp["raw"], inp["seg_sub_offset"], sp.cfg.lanes)
    w = np.asarray(words)[:scan.num_subsequences * C.CHUNK_SIZE_WORDS]

    host = golden.destuff_scan_host(np.frombuffer(data, np.uint8), scan)
    q = host.reshape(-1, 4).astype(np.uint32)
    host_words = (q[:, 0] << 24) | (q[:, 1] << 16) | (q[:, 2] << 8) | q[:, 3]
    assert np.array_equal(w, host_words)


def test_destuff_stuffed_bytes():
    # craft data where 0xFF values survive quantization round-trips rarely;
    # easiest robust check: noise image at q99 contains FF00 sequences
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (32, 32), np.uint8)
    data = encode(img, EncodeSpec(quality=99))
    assert b"\xff\x00" in data[2:-2]  # the interesting case is present
    plan, inputs = _setup(data, host_destuff=False)
    scan = plan.stream.scans[0]
    sp = plan.signature.scans[0]
    inp = inputs["scans"][0]
    words = jax.jit(destuff_scan, static_argnums=(2,))(
        inp["raw"], inp["seg_sub_offset"], sp.cfg.lanes)
    w = np.asarray(words)[:scan.num_subsequences * C.CHUNK_SIZE_WORDS]
    host = golden.destuff_scan_host(np.frombuffer(data, np.uint8), scan)
    q = host.reshape(-1, 4).astype(np.uint32)
    host_words = (q[:, 0] << 24) | (q[:, 1] << 16) | (q[:, 2] << 8) | q[:, 3]
    assert np.array_equal(w, host_words)


def test_native_destuff_matches_numpy(test_image):
    from jpeggpu_tpu import native
    data = encode(test_image, EncodeSpec(
        sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=3))
    plan, _ = _setup(data)
    scan = plan.stream.scans[0]
    buf = np.frombuffer(data, np.uint8)
    ref = golden.destuff_scan_host(buf, scan)
    out = native.destuff_host(buf[scan.begin:scan.end], scan.segments[:, 0],
                              scan.num_subsequences)
    if out is None:
        pytest.skip("native toolchain unavailable")
    assert np.array_equal(out, ref)


def test_device_destuff_pipeline_bitexact(test_image):
    """Full pipeline with on-device destuffing (host_destuff=False)."""
    from jpeggpu_tpu.pipeline import decode_jpeg_device
    data = encode(test_image, EncodeSpec(
        sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=2))
    plan = build_plan(parse(data), host_destuff=False)
    d = decode_jpeg_device(data, plan=plan)
    g = golden.decode(data)
    assert all(np.array_equal(a, b) for a, b in zip(g, d))


@pytest.mark.parametrize("spec", [
    EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)]),
    EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=3),
    EncodeSpec(sampling=[(1, 1), (1, 1), (1, 1)], restart_interval=7,
               quality=95),
])
def test_sync_states_match_sequential(test_image, spec):
    """Property: the Jacobi-synced per-subsequence states equal a sequential
    decode's states at every subsequence boundary (the paper's correctness
    condition), element for element."""
    data = encode(test_image, spec)
    plan, inputs = _setup(data)
    sp = plan.signature.scans[0]
    cfg = sp.cfg
    inp = inputs["scans"][0]

    def f(inp):
        arrs = H.ScanArrays(
            words=inp["words"], seg_of_subseq=inp["seg_of_subseq"],
            seg_first_lane=inp["seg_first_lane"],
            seg_num_subseq=inp["seg_num_subseq"], maxcode=inp["maxcode"],
            vsm=inp["vsm"], huffval=inp["huffval"])
        ctx = H.make_ctx(cfg, arrs)
        return H.sync_states(cfg, arrs, ctx)

    n_sub = parse(data).scans[0].num_subsequences
    p, c, z, n = [np.asarray(x)[:n_sub]
                  for x in jax.jit(f).lower(inp).compile()(inp)]
    expect = golden.sequential_boundary_states(
        plan.stream, plan.stream.scans[0], np.frombuffer(data, np.uint8))
    got = np.stack([p, c, z, n], axis=1)
    assert np.array_equal(got, expect)


def test_sync_states_head_width(test_image):
    """A widened chain-follow tier (Tuning.head_width > frontier_width //
    chain_follow, entering follow rounds straight after round 1) converges
    to exactly the sequential boundary states."""
    import dataclasses as _dc

    from jpeggpu_tpu.config import Tuning

    data = encode(test_image, EncodeSpec(
        sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=5, quality=95))
    plan, inputs = _setup(data)
    sp = plan.signature.scans[0]
    cfg = _dc.replace(sp.cfg, tuning=Tuning(chain_follow=3, frontier_width=8,
                                            head_width=8))
    inp = inputs["scans"][0]

    def f(inp):
        arrs = H.ScanArrays(
            words=inp["words"], seg_of_subseq=inp["seg_of_subseq"],
            seg_first_lane=inp["seg_first_lane"],
            seg_num_subseq=inp["seg_num_subseq"], maxcode=inp["maxcode"],
            vsm=inp["vsm"], huffval=inp["huffval"])
        ctx = H.make_ctx(cfg, arrs)
        return H.sync_states(cfg, arrs, ctx)

    n_sub = parse(data).scans[0].num_subsequences
    p, c, z, n = [np.asarray(x)[:n_sub]
                  for x in jax.jit(f).lower(inp).compile()(inp)]
    expect = golden.sequential_boundary_states(
        plan.stream, plan.stream.scans[0], np.frombuffer(data, np.uint8))
    got = np.stack([p, c, z, n], axis=1)
    assert np.array_equal(got, expect)


def test_sync_states_full_jacobi(test_image):
    """frontier_width=0 passed explicitly (the TPU auto mode): full-width
    masked Jacobi rounds to convergence, no compacted tiers — must equal
    the sequential boundary states exactly."""
    data = encode(test_image, EncodeSpec(
        sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=5, quality=95))
    plan, inputs = _setup(data)
    cfg = plan.signature.scans[0].cfg
    inp = inputs["scans"][0]

    def f(inp):
        arrs = H.ScanArrays(
            words=inp["words"], seg_of_subseq=inp["seg_of_subseq"],
            seg_first_lane=inp["seg_first_lane"],
            seg_num_subseq=inp["seg_num_subseq"], maxcode=inp["maxcode"],
            vsm=inp["vsm"], huffval=inp["huffval"])
        ctx = H.make_ctx(cfg, arrs)
        return H.sync_states(cfg, arrs, ctx, frontier_width=0)

    n_sub = parse(data).scans[0].num_subsequences
    p, c, z, n = [np.asarray(x)[:n_sub]
                  for x in jax.jit(f).lower(inp).compile()(inp)]
    expect = golden.sequential_boundary_states(
        plan.stream, plan.stream.scans[0], np.frombuffer(data, np.uint8))
    got = np.stack([p, c, z, n], axis=1)
    assert np.array_equal(got, expect)


def test_sync_states_chain_follow(test_image):
    """Chain-follow rounds (Gauss-Seidel within mis-synced chains,
    Tuning.chain_follow > 1) converge to exactly the sequential boundary
    states. Uses a narrow frontier width so compacted follow rounds are
    actually exercised, not just the full-width fallback."""
    import dataclasses as _dc

    from jpeggpu_tpu.config import Tuning

    data = encode(test_image, EncodeSpec(
        sampling=[(2, 2), (1, 1), (1, 1)], quality=95))
    plan, inputs = _setup(data)
    sp = plan.signature.scans[0]
    cfg = _dc.replace(sp.cfg, tuning=Tuning(chain_follow=3,
                                            frontier_width=6))
    inp = inputs["scans"][0]

    def f(inp):
        arrs = H.ScanArrays(
            words=inp["words"], seg_of_subseq=inp["seg_of_subseq"],
            seg_first_lane=inp["seg_first_lane"],
            seg_num_subseq=inp["seg_num_subseq"], maxcode=inp["maxcode"],
            vsm=inp["vsm"], huffval=inp["huffval"])
        ctx = H.make_ctx(cfg, arrs)
        return H.sync_states(cfg, arrs, ctx)

    n_sub = parse(data).scans[0].num_subsequences
    p, c, z, n = [np.asarray(x)[:n_sub]
                  for x in jax.jit(f).lower(inp).compile()(inp)]
    expect = golden.sequential_boundary_states(
        plan.stream, plan.stream.scans[0], np.frombuffer(data, np.uint8))
    got = np.stack([p, c, z, n], axis=1)
    assert np.array_equal(got, expect)


@pytest.mark.parametrize("wide_follow,head_width", [(2, 4), (3, 2), (1, 3)])
def test_sync_states_wide_follow(test_image, wide_follow, head_width):
    """Wide-tier chain-follow rounds (local heads at frontier_width, depth
    Tuning.wide_follow, then head compaction into the narrow tier) converge
    to exactly the sequential boundary states. Tiny widths force real head
    handoffs between the tiers."""
    import dataclasses as _dc

    from jpeggpu_tpu.config import Tuning

    data = encode(test_image, EncodeSpec(
        sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=4, quality=95))
    plan, inputs = _setup(data)
    sp = plan.signature.scans[0]
    cfg = _dc.replace(sp.cfg, tuning=Tuning(
        chain_follow=2, frontier_width=8, head_width=head_width,
        wide_follow=wide_follow))
    inp = inputs["scans"][0]

    def f(inp):
        arrs = H.ScanArrays(
            words=inp["words"], seg_of_subseq=inp["seg_of_subseq"],
            seg_first_lane=inp["seg_first_lane"],
            seg_num_subseq=inp["seg_num_subseq"], maxcode=inp["maxcode"],
            vsm=inp["vsm"], huffval=inp["huffval"])
        ctx = H.make_ctx(cfg, arrs)
        return H.sync_states(cfg, arrs, ctx)

    n_sub = parse(data).scans[0].num_subsequences
    p, c, z, n = [np.asarray(x)[:n_sub]
                  for x in jax.jit(f).lower(inp).compile()(inp)]
    expect = golden.sequential_boundary_states(
        plan.stream, plan.stream.scans[0], np.frombuffer(data, np.uint8))
    got = np.stack([p, c, z, n], axis=1)
    assert np.array_equal(got, expect)


def test_sync_states_dot_gather(test_image):
    """The one-hot MXU context gather (Tuning.ctx_gather="dot", the TPU
    auto choice) compacts frontier rounds bit-identically to the plain
    column take: converged states equal the sequential boundary states.
    A narrow frontier width forces real compacted rounds on CPU."""
    import dataclasses as _dc

    from jpeggpu_tpu.config import Tuning

    data = encode(test_image, EncodeSpec(
        sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=5, quality=95))
    plan, inputs = _setup(data)
    sp = plan.signature.scans[0]
    cfg = _dc.replace(sp.cfg, tuning=Tuning(ctx_gather="dot",
                                            chain_follow=2,
                                            frontier_width=8))
    inp = inputs["scans"][0]

    def f(inp):
        arrs = H.ScanArrays(
            words=inp["words"], seg_of_subseq=inp["seg_of_subseq"],
            seg_first_lane=inp["seg_first_lane"],
            seg_num_subseq=inp["seg_num_subseq"], maxcode=inp["maxcode"],
            vsm=inp["vsm"], huffval=inp["huffval"])
        ctx = H.make_ctx(cfg, arrs)
        return H.sync_states(cfg, arrs, ctx)

    n_sub = parse(data).scans[0].num_subsequences
    p, c, z, n = [np.asarray(x)[:n_sub]
                  for x in jax.jit(f).lower(inp).compile()(inp)]
    expect = golden.sequential_boundary_states(
        plan.stream, plan.stream.scans[0], np.frombuffer(data, np.uint8))
    got = np.stack([p, c, z, n], axis=1)
    assert np.array_equal(got, expect)


def test_expand_int8_shared_cells_extremes():
    """The 2-plane signed-int8 expand dot is exact when several records sum
    into one output cell (boundary data units shared between lanes in
    different supertiles) at value extremes: int8 and f32 expand modes
    agree on synthetic supertiles with overlapping bases."""
    from jpeggpu_tpu.ops import write_pallas as WP

    rng = np.random.default_rng(3)
    n_st, D = 8, WP._SUPER_D
    # sums stay within int16 (up to 8 overlapping rows x 4088), so both
    # modes agree without saturation-vs-wrap ambiguity at the final cast
    moderate = np.array([-4088, -4087, -256, -255, -129, -128, -127, -1,
                         0, 1, 127, 128, 255, 256, 4086, 4087], np.int64)
    stiles = rng.permuted(
        np.resize(moderate, n_st * D * 64)).reshape(
        n_st, D, 64).astype(np.int16)
    # heavy overlap: consecutive supertiles only 16 data units apart, so
    # most output rows sum 8 tile rows
    base = (np.arange(n_st, dtype=np.int32) * 16)
    # output rows 0..15 are covered only by supertile 0: full-range int16
    # extremes exercise the plane split without overlap sums
    extremes = np.array([-32768, -32767, -129, -128, -127, -1, 0, 1, 127,
                         128, 255, 256, 32766, 32767, -256, 257], np.int64)
    stiles[0, :16, :] = np.resize(extremes, (16, 64)).astype(np.int16)
    n_groups = 2
    q = np.zeros(n_groups, np.int32)
    outs = {}
    dcs = {}
    for dot in ("f32", "int8"):
        # int8 mode consumes the stage-1 byte-plane form
        tin = (WP.tiles_to_planes(stiles) if dot == "int8"
               else jnp.asarray(stiles))
        o, d = WP.expand_supertiles(
            tin, jnp.asarray(base), jnp.asarray(q),
            n_groups, n_st, dot=dot)
        outs[dot] = np.asarray(o).astype(np.int16)
        dcs[dot] = np.asarray(d).astype(np.int16)
    assert np.array_equal(outs["f32"], outs["int8"])
    assert outs["f32"].any()
    # the DC side output's column 0 equals the dense rows' column 0
    for dot in ("f32", "int8"):
        assert np.array_equal(dcs[dot][:, 0], outs[dot][:, 0])


@pytest.mark.parametrize("spec", [
    EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=2),
    EncodeSpec(sampling=[(1, 1), (1, 1), (1, 1)]),
    EncodeSpec(sampling=[(2, 1), (1, 1), (1, 1)], restart_interval=5,
               quality=95),
])
def test_write_matmul_matches_golden(test_image, spec):
    """The dense-emission + MXU tile-assembly write path is bit-identical to
    the golden decoder (and hence to the scatter path)."""
    from jpeggpu_tpu.config import Tuning
    from jpeggpu_tpu.pipeline import decode_jpeg_device

    data = encode(test_image, spec)
    plan = build_plan(parse(data), tuning=Tuning(write_mode="matmul"))
    d = decode_jpeg_device(data, plan=plan)
    g = golden.decode(data)
    assert all(np.array_equal(a, b) for a, b in zip(g, d))


def test_write_matmul_garbage_stream(test_image):
    """Matmul write path on a garbage scan body: deterministic and equal to
    golden (exercises segment-bound clamping and inert-slot sentinels)."""
    from jpeggpu_tpu.config import Tuning
    from jpeggpu_tpu.pipeline import decode_jpeg_device

    data = encode(test_image[..., 0], EncodeSpec(restart_interval=3))
    s = parse(data)
    scan = s.scans[0]
    rng = np.random.default_rng(21)
    body = rng.integers(0, 255, scan.end - scan.begin, dtype=np.uint8)
    body[body == 0xFF] = 0x7F
    garbled = data[:scan.begin] + body.tobytes() + data[scan.end:]
    plan = build_plan(parse(garbled), tuning=Tuning(write_mode="matmul"))
    d = decode_jpeg_device(garbled, plan=plan)
    g = golden.decode(garbled)
    assert all(np.array_equal(a, b) for a, b in zip(g, d))


@pytest.mark.parametrize("spec", [
    EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=2),
    EncodeSpec(sampling=[(1, 1), (1, 1), (1, 1)]),
    EncodeSpec(sampling=[(2, 1), (1, 1), (1, 1)], restart_interval=5,
               quality=95),
])
@pytest.mark.parametrize("tile_mode", ["lane", "super"])
def test_write_tiles_matches_golden(test_image, spec, tile_mode):
    """The Pallas MXU tile-assembly write path (interpret mode on CPU) is
    bit-identical to the golden decoder, in both the per-lane and the
    supertile stage-1 shapes."""
    from jpeggpu_tpu.config import Tuning
    from jpeggpu_tpu.pipeline import decode_jpeg_device

    data = encode(test_image, spec)
    plan = build_plan(parse(data), tuning=Tuning(write_mode="tiles",
                                                 tile_mode=tile_mode))
    d = decode_jpeg_device(data, plan=plan)
    g = golden.decode(data)
    assert all(np.array_equal(a, b) for a, b in zip(g, d))


def test_write_tiles_super_int8_strim(test_image):
    """The int8 byte-plane supertile dots and a tight record-slot trim
    (both TPU perf knobs, v5e sweep 2026-08-20) stay bit-identical to
    golden through the public plan path."""
    from jpeggpu_tpu.config import Tuning
    from jpeggpu_tpu.pipeline import decode_jpeg_device

    data = encode(test_image, EncodeSpec(
        sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=3))
    plan = build_plan(parse(data), tuning=Tuning(
        write_mode="tiles", tile_mode="super", tile_dot="int8", s_trim=256))
    d = decode_jpeg_device(data, plan=plan)
    g = golden.decode(data)
    assert all(np.array_equal(a, b) for a, b in zip(g, d))


def test_write_tiles_slot_trim_fallback(test_image, monkeypatch):
    """With the record-slot trim forced below real lane record counts,
    over-trim lanes must drain through the leftover scatter bit-exactly
    (the trim is a traffic optimization, never a correctness assumption)."""
    from jpeggpu_tpu.config import Tuning
    from jpeggpu_tpu.ops import write_pallas as WP
    from jpeggpu_tpu.pipeline import decode_jpeg_device

    orig = WP.assemble_supertiles

    def tiny_trim(*args, s_trim=512, **kw):
        return orig(*args, s_trim=128, **kw)

    monkeypatch.setattr(WP, "assemble_supertiles", tiny_trim)
    # the AOT executable cache keys on the plan signature, which cannot see
    # the monkeypatch — clear it so this decode really traces tiny_trim
    from jpeggpu_tpu import pipeline as PL

    PL._EXEC_CACHE.clear()
    data = encode(test_image, EncodeSpec(quality=95))
    plan = build_plan(parse(data), tuning=Tuning(write_mode="tiles",
                                                 tile_mode="super"))
    try:
        d = decode_jpeg_device(data, plan=plan)
    finally:
        PL._EXEC_CACHE.clear()  # drop executables traced with tiny_trim
    g = golden.decode(data)
    assert all(np.array_equal(a, b) for a, b in zip(g, d))


def test_write_tiles_garbage_stream(test_image):
    """Tiles write path on a garbage scan body: deterministic and equal to
    golden (exercises the leftover element-scatter escape for lanes whose
    slab window or tile span overflows)."""
    from jpeggpu_tpu.config import Tuning
    from jpeggpu_tpu.pipeline import decode_jpeg_device

    data = encode(test_image[..., 0], EncodeSpec(restart_interval=3))
    s = parse(data)
    scan = s.scans[0]
    rng = np.random.default_rng(23)
    body = rng.integers(0, 255, scan.end - scan.begin, dtype=np.uint8)
    body[body == 0xFF] = 0x7F
    garbled = data[:scan.begin] + body.tobytes() + data[scan.end:]
    for tile_mode in ("lane", "super"):
        plan = build_plan(parse(garbled),
                          tuning=Tuning(write_mode="tiles",
                                        tile_mode=tile_mode))
        d = decode_jpeg_device(garbled, plan=plan)
        g = golden.decode(garbled)
        assert all(np.array_equal(a, b) for a, b in zip(g, d))


def test_write_tiles_leftover_lanes():
    """A flat low-entropy image produces subsequences spanning more data
    units than the tile window; those lanes must drain through the leftover
    scatter loop bit-exactly."""
    from jpeggpu_tpu.config import Tuning
    from jpeggpu_tpu.ops import write_pallas
    from jpeggpu_tpu.pipeline import decode_jpeg_device

    img = np.full((128, 136), 130, np.uint8)  # flat gray: ~3 bits per du
    data = encode(img, EncodeSpec(quality=50))
    stream = parse(data)
    scan = stream.scans[0]
    assert (scan.total_data_units / scan.num_subsequences
            > write_pallas._TILE_D)
    for tile_mode in ("lane", "super"):
        plan = build_plan(stream, tuning=Tuning(write_mode="tiles",
                                                tile_mode=tile_mode))
        d = decode_jpeg_device(data, plan=plan)
        g = golden.decode(data)
        assert all(np.array_equal(a, b) for a, b in zip(g, d))


@pytest.mark.parametrize("spec", [
    EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=2),
    EncodeSpec(sampling=[(1, 1), (1, 1), (1, 1)], quality=95),
])
def test_pallas_entropy_backend_bitexact(test_image, spec):
    """The fused Pallas sync + write kernels (interpret mode on CPU) are
    bit-identical to the golden decoder."""
    from jpeggpu_tpu.config import Tuning
    from jpeggpu_tpu.pipeline import decode_jpeg_device

    data = encode(test_image, spec)
    plan = build_plan(parse(data), tuning=Tuning(entropy_backend="pallas",
                                                 write_mode="fused"))
    d = decode_jpeg_device(data, plan=plan)
    g = golden.decode(data)
    assert all(np.array_equal(a, b) for a, b in zip(g, d))


@pytest.mark.parametrize("tile_dot", ["bf16", "int8"])
def test_write_tiles_narrow_dot_bitexact(test_image, tile_dot):
    """The narrow-dtype tile-assembly contractions (lo/hi byte-plane dots,
    write_pallas._tiles_kernel) place coefficients bit-identically to the
    f32 formulation for positive and negative values across the int16
    range exercised by a real image."""
    from jpeggpu_tpu.config import Tuning
    from jpeggpu_tpu.pipeline import decode_jpeg_device

    data = encode(test_image, EncodeSpec(
        sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=2, quality=97))
    plan = build_plan(parse(data), tuning=Tuning(write_mode="tiles",
                                                 tile_dot=tile_dot))
    d = decode_jpeg_device(data, plan=plan)
    g = golden.decode(data)
    assert all(np.array_equal(a, b) for a, b in zip(g, d))


def test_tiles_narrow_dot_value_range():
    """Byte-plane splitting is exact at the extremes: synthetic records
    covering -32768..32767 boundaries round-trip through every tile_dot
    mode identically."""
    import jax.numpy as jnp

    from jpeggpu_tpu.ops import write_pallas

    lanes, s_cap, tile_d = 128, 128, 32
    rng = np.random.default_rng(7)
    vals = np.zeros((s_cap, lanes), np.int16)
    wpos = np.full((s_cap, lanes), -1, np.int32)
    m = np.zeros(lanes, np.int32)
    du0 = np.arange(lanes, dtype=np.int32) * 2  # nondecreasing
    extremes = np.array([-32768, -32767, -256, -255, -129, -128, -127, -1,
                         0, 1, 127, 128, 255, 256, 32766, 32767], np.int64)
    for lane in range(lanes):
        k = int(rng.integers(1, 40))
        m[lane] = k
        pos = np.sort(rng.choice(tile_d * 64, size=k, replace=False))
        vals[:k, lane] = rng.permuted(
            np.resize(extremes, k)).astype(np.int16)
        wpos[:k, lane] = du0[lane] * 64 + pos
    include = np.ones(lanes, bool)
    outs = {}
    for mode in ("f32", "bf16", "int8"):
        outs[mode] = np.asarray(write_pallas.tiles_from_records(
            jnp.asarray(vals), jnp.asarray(wpos), jnp.asarray(m),
            jnp.asarray(du0), jnp.asarray(include), tile_d, mode))
    assert np.array_equal(outs["f32"], outs["bf16"])
    assert np.array_equal(outs["f32"], outs["int8"])
    # sanity: the synthetic records actually landed
    assert outs["f32"].any()


@pytest.mark.parametrize("spec", [
    EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=2),
    EncodeSpec(sampling=[(2, 1), (1, 1), (1, 1)], quality=95),
])
def test_pallas_emit_tiles_bitexact(test_image, spec):
    """The TPU production combination — Pallas sync + Pallas dense emission
    + MXU tile assembly (interpret mode on CPU) — is bit-identical to the
    golden decoder."""
    from jpeggpu_tpu.config import Tuning
    from jpeggpu_tpu.pipeline import decode_jpeg_device

    data = encode(test_image, spec)
    plan = build_plan(parse(data), tuning=Tuning(entropy_backend="pallas",
                                                 write_mode="tiles"))
    d = decode_jpeg_device(data, plan=plan)
    g = golden.decode(data)
    assert all(np.array_equal(a, b) for a, b in zip(g, d))


def test_pallas_write_residual_lanes():
    """A low-entropy image produces subsequences spanning more data units
    than the kernel's VMEM window; those lanes must resume exactly on the
    XLA straggler path."""
    from jpeggpu_tpu.config import Tuning
    from jpeggpu_tpu.ops import huffman_pallas
    from jpeggpu_tpu.pipeline import decode_jpeg_device

    img = np.full((128, 136), 130, np.uint8)  # flat gray: ~3 bits per du
    data = encode(img, EncodeSpec(quality=50))
    stream = parse(data)
    scan = stream.scans[0]
    # sanity: the stream really exceeds the du window per subsequence
    assert scan.total_data_units / scan.num_subsequences > huffman_pallas._WRITE_D
    plan = build_plan(stream, tuning=Tuning(entropy_backend="pallas",
                                            write_mode="fused"))
    d = decode_jpeg_device(data, plan=plan)
    g = golden.decode(data)
    assert all(np.array_equal(a, b) for a, b in zip(g, d))


def test_idct_int_reference_values():
    """The integer IDCT matches a float IDCT within fixed-point tolerance
    and matches itself across numpy/jax exactly."""
    rng = np.random.default_rng(5)
    blocks = rng.integers(-300, 300, (10, 8, 8)).astype(np.int32)
    blocks[:, 4:, :] = 0  # plausible coefficient decay
    q = np.ones(64, np.int32) * 4
    out_np = dequant_idct_blocks(np, blocks, q)
    out_jx = np.asarray(jax.jit(
        lambda b, qq: dequant_idct_blocks(jnp, b, qq))(blocks, q))
    assert np.array_equal(out_np, out_jx)
    assert out_np.min() >= 0 and out_np.max() <= 255

    # float reference (orthonormal IDCT + level shift)
    k = np.arange(8)
    cos = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    cu = np.where(k == 0, 1 / np.sqrt(2), 1.0)
    m = 0.5 * cu[:, None] * cos
    dq = (blocks * 4).astype(np.float64)
    ref = np.einsum("ux,nuv,vy->nxy", m, dq, m) + 128
    ref = np.clip(np.round(ref), 0, 255)
    assert np.abs(out_np - ref).max() <= 1  # fixed-point rounding


def test_idct_signed_qtable_quirk():
    """Quantization bytes > 127 are multiplied as signed int8
    (reference idct.cu:179) — verify we reproduce that."""
    blocks = np.zeros((1, 8, 8), np.int32)
    blocks[0, 0, 0] = 10
    q = np.full(64, 200, np.int32)  # int8 -> -56
    out = dequant_idct_blocks(np, blocks, q)
    q_small = np.full(64, 56, np.int32)
    out_pos = dequant_idct_blocks(np, -blocks, q_small)
    assert np.array_equal(out, out_pos)


def test_dc_undelta_wraps_like_int16():
    """DC accumulation wraps at int16 like the reference's int16 scan."""
    from jpeggpu_tpu.ops.dc import undelta_dc
    cfg = H.ScanConfig(num_subseq=1, lanes=256, num_segments=1, du_per_mcu=1,
                       mcus_per_seg=4, total_mcus=4,
                       comp_groups=((1, 0, 1),))
    coeffs = np.zeros(4 * 64, np.int16)
    coeffs[0::64] = [30000, 10000, 10000, -5000]
    out = np.asarray(jax.jit(
        lambda x: undelta_dc(cfg, ((0, 1),), x))(jnp.asarray(coeffs)))
    dc = out[0::64].astype(np.int64)
    expect = np.cumsum([30000, 10000, 10000, -5000])
    expect = ((expect + 0x8000) % 0x10000) - 0x8000
    assert np.array_equal(dc, expect)


def test_idct_pallas_interpret_matches_xla():
    """The Pallas IDCT kernel (interpret mode on CPU) is bit-identical to
    the XLA formulation."""
    from unittest import mock
    import jpeggpu_tpu.ops.idct_pallas as ip
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(9)
    blocks = rng.integers(-1000, 1000, (70, 8, 8)).astype(np.int32)
    q = rng.integers(1, 255, 64).astype(np.int32)
    ref = dequant_idct_blocks(np, blocks, q)

    orig_call = pl.pallas_call
    with mock.patch.object(pl, "pallas_call",
                           lambda *a, **k: orig_call(*a, interpret=True, **k)):
        out = np.asarray(ip.dequant_idct_blocks_pallas(
            jnp.asarray(blocks), jnp.asarray(q)))
    assert np.array_equal(ref, out)


def test_decode_scan_dc_side_output(test_image):
    """decode_scan(return_dc=True) on the supertile write path returns a DC
    side vector equal to the assembled stream's slot-0 column — including
    leftover-lane corrections (the flat-gray image drains every lane
    through the leftover scatter)."""
    from jpeggpu_tpu.config import Tuning

    flat = np.full((128, 136), 130, np.uint8)
    cases = [
        encode(test_image, EncodeSpec(
            sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=2)),
        encode(flat, EncodeSpec(quality=50)),
    ]
    for data in cases:
        plan = build_plan(parse(data), tuning=Tuning(write_mode="tiles",
                                                     tile_mode="super"))
        inputs = build_inputs(data, plan)
        sp = plan.signature.scans[0]
        cfg = sp.cfg
        i = inputs["scans"][0]
        arrs = H.ScanArrays(
            words=jnp.asarray(i["words"]),
            seg_of_subseq=jnp.asarray(i["seg_of_subseq"]),
            seg_first_lane=jnp.asarray(i["seg_first_lane"]),
            seg_num_subseq=jnp.asarray(i["seg_num_subseq"]),
            maxcode=jnp.asarray(i["maxcode"]), vsm=jnp.asarray(i["vsm"]),
            huffval=jnp.asarray(i["huffval"]))
        coeffs, dc = H.decode_scan(cfg, arrs, return_dc=True)
        assert dc is not None
        total_du = cfg.total_mcus * cfg.du_per_mcu
        want = np.asarray(coeffs).reshape(total_du, 64)[:, 0]
        assert np.array_equal(np.asarray(dc)[:total_du], want)


@pytest.mark.parametrize("du_per_mcu,mcus_per_seg,total_mcus", [
    (6, 3, 200),    # seg_du 18, g 64, nseg 67 -> aligned path
    (6, 42, 400),   # seg_du 252, g 32, nseg 10 -> fallback path
    (3, 128, 1000), # seg_du 384, g 1 (128-aligned rows), partial last seg
    (1, 7, 2000),   # seg_du 7 (odd), g 128, nseg 286 -> aligned path
])
def test_undelta_dc_values_aligned_fold(du_per_mcu, mcus_per_seg,
                                        total_mcus):
    """The lane-aligned 2D-fold segmented DC cumsum (_dcv_aligned) and the
    dc= side-vector input are bit-identical to a direct numpy reference
    (segmented per-component cumsum with int16 wrap), across aligned,
    fallback, odd-segment and partial-final-segment geometries."""
    from jpeggpu_tpu.ops.dc import undelta_dc_values

    cfg = H.ScanConfig(
        num_subseq=8, lanes=8, num_segments=1, du_per_mcu=du_per_mcu,
        mcus_per_seg=mcus_per_seg, total_mcus=total_mcus,
        comp_groups=((du_per_mcu, 0, 1),))
    total_du = total_mcus * du_per_mcu
    rng = np.random.default_rng(13)
    dc = rng.integers(-2048, 2048, total_du).astype(np.int16)
    coeffs = np.zeros((total_du, 64), np.int16)
    coeffs[:, 0] = dc
    if du_per_mcu == 6:
        comp_slots = ((0, 4), (4, 1), (5, 1))
    elif du_per_mcu == 3:
        comp_slots = ((0, 1), (1, 1), (2, 1))
    else:
        comp_slots = ((0, 1),)

    # numpy reference: per component, segmented cumsum over its slots
    seg_du = mcus_per_seg * du_per_mcu
    slot = np.arange(total_du) % du_per_mcu
    seg = np.arange(total_du) // seg_du
    ref = np.zeros(total_du, np.int64)
    for off, cnt in comp_slots:
        sel = (slot >= off) & (slot < off + cnt)
        for s in range(seg.max() + 1):
            idx = np.nonzero(sel & (seg == s))[0]
            ref[idx] = np.cumsum(dc[idx].astype(np.int64))
    ref16 = ((ref + 0x8000) % 0x10000 - 0x8000).astype(np.int16)

    got = np.asarray(undelta_dc_values(cfg, comp_slots,
                                       jnp.asarray(coeffs.reshape(-1))))
    assert np.array_equal(got, ref16)
    # dc= side-vector input (padded like the expand side output)
    dcp = np.concatenate([dc, np.zeros(129, np.int16)])
    got2 = np.asarray(undelta_dc_values(cfg, comp_slots,
                                        dc=jnp.asarray(dcp)))
    assert np.array_equal(got2, ref16)


@pytest.mark.parametrize("spec", [
    EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=3),
    EncodeSpec(sampling=[(2, 1), (1, 1), (1, 1)], quality=95),
    EncodeSpec(sampling=[(1, 2), (1, 1), (1, 1)]),
])
def test_idct_stream_to_plane_matches_split_tail(test_image, spec):
    """The fused stream->plane IDCT kernel (de-interleave via block index
    maps + in-kernel IDCT, interpret mode on CPU) is bit-identical to the
    split tail (ops/transpose.py deinterleave + dequant_idct_plane) for
    every component."""
    from jpeggpu_tpu.ops.dc import undelta_dc
    from jpeggpu_tpu.ops.idct import dequant_idct_plane
    from jpeggpu_tpu.ops.idct_pallas import idct_stream_to_plane
    from jpeggpu_tpu.ops.transpose import deinterleave

    data = encode(test_image, spec)
    plan, inputs = _setup(data)
    sp = plan.signature.scans[0]
    cfg = sp.cfg
    i = inputs["scans"][0]
    arrs = H.ScanArrays(
        words=jnp.asarray(i["words"]),
        seg_of_subseq=jnp.asarray(i["seg_of_subseq"]),
        seg_first_lane=jnp.asarray(i["seg_first_lane"]),
        seg_num_subseq=jnp.asarray(i["seg_num_subseq"]),
        maxcode=jnp.asarray(i["maxcode"]), vsm=jnp.asarray(i["vsm"]),
        huffval=jnp.asarray(i["huffval"]))
    coeffs_raw = H.decode_scan(cfg, arrs)
    comp_slots = tuple((c[1], c[2] * c[3]) for c in sp.comps)
    coeffs = undelta_dc(cfg, comp_slots, coeffs_raw)
    from jpeggpu_tpu.ops.dc import undelta_dc_values

    dcv = undelta_dc_values(cfg, comp_slots, coeffs_raw)
    t_comps = [(c[1], c[2], c[3], 0) for c in sp.comps]
    planes = deinterleave(cfg, coeffs, sp.num_mcus_x, sp.num_mcus_y, t_comps)
    qt = jnp.asarray(inputs["qtables"])
    for c, plane in zip(sp.comps, planes):
        ref = np.asarray(dequant_idct_plane(plane, qt[c[6]]))
        fused = np.asarray(idct_stream_to_plane(
            coeffs, qt[c[6]], sp.num_mcus_x, sp.num_mcus_y,
            cfg.du_per_mcu, c[1], c[2], c[3]))
        assert np.array_equal(ref, fused)
        # DC-override form (the production fused tail): raw-DC stream +
        # side vector must produce the identical plane
        fused2 = np.asarray(idct_stream_to_plane(
            coeffs_raw, qt[c[6]], sp.num_mcus_x, sp.num_mcus_y,
            cfg.du_per_mcu, c[1], c[2], c[3], dc_override=dcv))
        assert np.array_equal(ref, fused2)
