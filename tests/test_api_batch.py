"""Five-phase API contract + batched/sharded decode tests."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from jpeggpu_tpu import Decoder, decode, decode_rgb, golden
from jpeggpu_tpu.encoder import EncodeSpec, encode
from jpeggpu_tpu.errors import InvalidArgument
from jpeggpu_tpu.parallel import BatchDecoder, decode_batch, make_mesh


def test_five_phase_protocol(test_image):
    data = encode(test_image, EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)]))
    with Decoder() as d:
        info = d.parse_header(data)
        assert info.num_components == 3
        assert info.sizes_x == [67, 34, 34]
        assert info.sizes_y == [45, 23, 23]
        assert info.subsampling[0] == (2, 2)
        size = d.get_buffer_size()
        # memory is knowable from the header: a real decode stages scan
        # words + tables and produces planes, so the footprint is positive
        assert size > 0
        d.transfer()
        planes = d.decode()
        ref = golden.decode(data)
        for a, b in zip(ref, planes):
            assert np.array_equal(a, b)


def test_decode_without_parse_raises():
    with pytest.raises(InvalidArgument):
        Decoder().decode()


def test_handle_reuse(test_image):
    d = Decoder()
    for q in (50, 90):
        data = encode(test_image, EncodeSpec(quality=q))
        d.parse_header(data)
        planes = d.decode()
        ref = golden.decode(data)
        assert all(np.array_equal(a, b) for a, b in zip(ref, planes))
    d.cleanup()


def test_decode_rgb(test_image):
    data = encode(test_image, EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)]))
    rgb = decode_rgb(data)
    assert rgb.shape == (45, 67, 3)
    # sanity: close-ish to the original image
    err = np.abs(rgb.astype(int) - test_image.astype(int)).mean()
    assert err < 16, err


def test_batch_same_geometry(test_image):
    datas = [encode(np.roll(test_image, i, axis=0),
                    EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)]))
             for i in range(3)]
    out = decode_batch(datas)
    for data, planes in zip(datas, out):
        ref = golden.decode(data)
        for a, b in zip(ref, planes):
            assert np.array_equal(a, b)


def test_batch_mixed_geometry(test_image):
    datas = [
        encode(test_image, EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)])),
        encode(test_image[..., 0]),
        encode(test_image, EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)],
                                      quality=40)),
    ]
    out = decode_batch(datas)
    assert len(out[1]) == 1  # grayscale
    for data, planes in zip(datas, out):
        ref = golden.decode(data)
        for a, b in zip(ref, planes):
            assert np.array_equal(a, b)


def test_sharded_batch_8_devices(test_image):
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide 8 fake CPU devices"
    mesh = make_mesh(devices[:8])
    datas = [encode(np.roll(test_image, i, axis=1),
                    EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)]))
             for i in range(8)]
    out = BatchDecoder(mesh=mesh).decode(datas)
    for data, planes in zip(datas, out):
        ref = golden.decode(data)
        for a, b in zip(ref, planes):
            assert np.array_equal(a, b)


def test_sharded_batch_padding(test_image):
    # 5 images on an 8-device mesh: pads to 8, results unaffected
    mesh = make_mesh(jax.devices()[:8])
    datas = [encode(np.roll(test_image, i, axis=0),
                    EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)]))
             for i in range(5)]
    out = BatchDecoder(mesh=mesh).decode(datas)
    assert len(out) == 5
    ref = golden.decode(datas[2])
    assert all(np.array_equal(a, b) for a, b in zip(ref, out[2]))


def test_graft_entry_single_chip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (40, 56)


def test_graft_entry_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_merged_batch_bitexact(test_image):
    """Merged-lane batching (shared tables) is bit-exact per image."""
    datas = [encode(np.roll(test_image, 7 * i, axis=0),
                    EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)]))
             for i in range(4)]
    dec = BatchDecoder(merged=True)
    out = dec.decode(datas)
    assert any("merged" in str(k) for k in dec._exec_cache)
    for data, planes in zip(datas, out):
        ref = golden.decode(data)
        for a, b in zip(ref, planes):
            assert np.array_equal(a, b)


def test_merged_split_assembly_bitexact(test_image):
    """Merged sync/emit + per-image supertile assembly with pos_offset
    rebasing (_merged_scan_coeffs_split, the fused batch tail's scan
    stage) equals per-image decode_scan exactly — coefficients and DC
    side vectors."""
    import jax.numpy as jnp

    from jpeggpu_tpu.config import Tuning
    from jpeggpu_tpu.ops import huffman as H
    from jpeggpu_tpu.parallel.batch import (_merged_scan_coeffs_split,
                                            _tables_shared,
                                            merge_scan_inputs)
    from jpeggpu_tpu.pipeline import build_inputs, build_plan
    from jpeggpu_tpu.reader import parse

    tuning = Tuning(write_mode="tiles", tile_mode="super")
    # the same stream twice: image 1 still exercises the pos_offset
    # rebase (its positions sit at [T, 2T) in the merged emit)
    data = encode(test_image, EncodeSpec(
        sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=3))
    datas = [data, data]
    plans = [build_plan(parse(d), tuning=tuning) for d in datas]
    assert plans[0].signature == plans[1].signature
    inputs = [build_inputs(d, p) for d, p in zip(datas, plans)]
    sig = plans[0].signature
    sp = sig.scans[0]
    assert _tables_shared([bi["scans"][0] for bi in inputs])
    merged = merge_scan_inputs(sp, [bi["scans"][0] for bi in inputs])
    out = _merged_scan_coeffs_split(
        sp, {k: jnp.asarray(v) for k, v in merged.items()}, 2)
    tdu = sp.cfg.total_positions // 64
    for bi, (co, dc) in zip(inputs, out):
        i = bi["scans"][0]
        arrs = H.ScanArrays(
            words=jnp.asarray(i["words"]),
            seg_of_subseq=jnp.asarray(i["seg_of_subseq"]),
            seg_first_lane=jnp.asarray(i["seg_first_lane"]),
            seg_num_subseq=jnp.asarray(i["seg_num_subseq"]),
            maxcode=jnp.asarray(i["maxcode"]), vsm=jnp.asarray(i["vsm"]),
            huffval=jnp.asarray(i["huffval"]))
        ref, refdc = H.decode_scan(sp.cfg, arrs, return_dc=True)
        assert np.array_equal(np.asarray(co), np.asarray(ref))
        assert np.array_equal(np.asarray(dc)[:tdu],
                              np.asarray(refdc)[:tdu])


def test_mixed_stream_lengths_share_one_executable():
    """Images of equal pixel geometry but very different stream lengths
    (different lane buckets) pad up to the group max and share ONE
    executable (VERDICT r1 #9: cross-bucket padding policy)."""
    flat = np.full((80, 96, 3), 128, np.uint8)
    rng = np.random.default_rng(5)
    noise = rng.integers(0, 255, (80, 96, 3)).astype(np.uint8)
    datas = [encode(flat, EncodeSpec(quality=30)),
             encode(noise, EncodeSpec(quality=95)),
             encode(noise, EncodeSpec(quality=50))]
    assert len(datas[1]) > 3 * len(datas[0])  # genuinely different buckets
    dec = BatchDecoder()
    out = dec.decode(datas)
    assert len(dec._exec_cache) == 1
    for data, planes in zip(datas, out):
        ref = golden.decode(data)
        for a, b in zip(ref, planes):
            assert np.array_equal(a, b)


def test_mixed_size_batch_two_executables(test_image):
    """A batch with two pixel geometries compiles exactly one executable per
    geometry, independent of per-image stream lengths."""
    big = np.kron(test_image, np.ones((2, 2, 1))).astype(np.uint8)
    rng = np.random.default_rng(11)
    datas = [encode(test_image, EncodeSpec(quality=40)),
             encode(test_image, EncodeSpec(quality=95)),
             encode(big, EncodeSpec(quality=40)),
             encode(np.clip(big + rng.integers(-20, 20, big.shape), 0, 255)
                    .astype(np.uint8), EncodeSpec(quality=95))]
    dec = BatchDecoder()
    out = dec.decode(datas)
    assert len(dec._exec_cache) == 2
    for data, planes in zip(datas, out):
        ref = golden.decode(data)
        for a, b in zip(ref, planes):
            assert np.array_equal(a, b)


def test_merged_batch_with_restarts(test_image):
    # identical payloads guarantee equal geometry buckets (distinct images
    # only group when their bucketed sizes coincide)
    data = encode(test_image, EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)],
                                         restart_interval=2))
    datas = [data] * 3
    dec = BatchDecoder(merged=True)
    out = dec.decode(datas)
    assert any("merged" in str(k) for k in dec._exec_cache)
    for data, planes in zip(datas, out):
        ref = golden.decode(data)
        for a, b in zip(ref, planes):
            assert np.array_equal(a, b)


def test_device_resident_decode(test_image):
    """decode(device=True) returns jax.Arrays with no host sync (the
    reference's stream-ordered no-hidden-sync contract, jpeggpu.h:90-109)."""
    data = encode(test_image, EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)]))
    with Decoder() as d:
        d.parse_header(data)
        out = d.decode(device=True)
        # no numpy materialization happened: these are device arrays the
        # caller can chain into further jitted work
        assert all(isinstance(p, jax.Array) for p in out)
        chained = jax.jit(lambda p: p.astype(jnp.int32) + 1)(out[0])
        ref = golden.decode(data)
        for a, b in zip(ref, out):
            assert np.array_equal(a, np.asarray(b))
        assert np.array_equal(np.asarray(chained), ref[0].astype(np.int32) + 1)


def test_donated_decode_consumes_staged_buffers(test_image):
    """decode(donate=True): staged scan buffers are donated to the
    executable (caller-owned d_tmp consumed by decode, jpeggpu.h:90-109);
    the handle restages on the next decode and stays correct."""
    data = encode(test_image, EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)]))
    ref = golden.decode(data)
    with Decoder() as d:
        d.parse_header(data)
        d.transfer()
        staged = d._device_inputs["scans"][0]["words"]
        planes = d.decode(donate=True)
        for a, b in zip(ref, planes):
            assert np.array_equal(a, b)
        if jax.default_backend() != "cpu":  # CPU ignores donation
            assert staged.is_deleted()  # the donated buffer was consumed
        # handle remains usable: decode restages
        planes2 = d.decode()
        for a, b in zip(ref, planes2):
            assert np.array_equal(a, b)


def test_decode_into_reuses_caller_buffers(test_image):
    """decode_into writes planes into caller-owned device buffers with
    pitch semantics (jpeggpu.h:95-100): two decodes reuse the same memory
    with no reallocation, and bytes past the component extent survive."""
    from jpeggpu_tpu.errors import InvalidArgument

    data = encode(test_image, EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)]))
    ref = golden.decode(data)
    with Decoder() as d:
        info = d.parse_header(data)
        # pitch: 5 columns / 3 rows of slack, pre-filled with a sentinel
        outs = [jax.device_put(np.full((sy + 3, sx + 5), 0xAB, np.uint8))
                for sx, sy in zip(info.sizes_x, info.sizes_y)]
        ptrs = [o.unsafe_buffer_pointer() for o in outs]
        outs = d.decode_into(outs)
        for (a, b, sx, sy) in zip(ref, outs, info.sizes_x, info.sizes_y):
            got = np.asarray(b)
            assert np.array_equal(a, got[:sy, :sx])
            assert (got[sy:, :] == 0xAB).all() and (got[:, sx:] == 0xAB).all()
        # second decode into the returned handles: same memory, no realloc
        outs2 = d.decode_into(outs)
        if jax.default_backend() != "cpu":  # CPU may ignore donation
            assert [o.unsafe_buffer_pointer() for o in outs2] == ptrs
        for (a, b, sx, sy) in zip(ref, outs2, info.sizes_x, info.sizes_y):
            assert np.array_equal(a, np.asarray(b)[:sy, :sx])
        # validation parity with decoder.cpp:336-353: pitch < width rejected
        bad = [jax.device_put(np.zeros((sy, sx - 1), np.uint8))
               for sx, sy in zip(info.sizes_x, info.sizes_y)]
        with pytest.raises(InvalidArgument):
            d.decode_into(bad)


def test_debug_destuff_cross_check_fires(test_image, monkeypatch):
    """The is_debug device-vs-host destuff comparison (the analog of
    decode_destuff.cu:242-253) passes on a good decode and raises
    InternalError when the device destuffer is corrupted."""
    from jpeggpu_tpu import debug
    from jpeggpu_tpu.errors import InternalError
    from jpeggpu_tpu.ops import destuff as destuff_mod

    data = encode(test_image, EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)],
                                         restart_interval=2))
    debug.set_debug(True)
    try:
        with Decoder(host_destuff=False) as d:
            d.parse_header(data)
            planes = d.decode()
        ref = golden.decode(data)
        for a, b in zip(ref, planes):
            assert np.array_equal(a, b)

        good = destuff_mod.destuff_scan

        def corrupted(raw, seg_sub_offset, lanes):
            words = good(raw, seg_sub_offset, lanes)
            return words.at[3].set(words[3] ^ 0xDEAD)

        monkeypatch.setattr(destuff_mod, "destuff_scan", corrupted)
        with Decoder(host_destuff=False) as d:
            d.parse_header(data)
            with pytest.raises(InternalError, match="destuff"):
                d.decode()
    finally:
        debug.set_debug(False)


def test_mesh_batch_uses_merged_lane_path(test_image):
    """On a mesh, BatchDecoder must route same-table groups through the
    merged-lane shard_map path (one wide decode per device), not the
    vmapped pipeline."""
    datas = [encode(np.roll(test_image, 3 * i, axis=1),
                    EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)]))
             for i in range(8)]
    mesh = make_mesh(jax.devices()[:4])
    dec = BatchDecoder(mesh=mesh)
    out = dec.decode(datas)
    assert any("mesh_merged" in k for k in dec._exec_cache), \
        list(dec._exec_cache)
    for data, planes in zip(datas, out):
        ref = golden.decode(data)
        for a, b in zip(ref, planes):
            assert np.array_equal(a, b)
