"""Robustness: malformed input handling (host validation + total device
kernels, matching the reference's philosophy — SURVEY.md §5)."""

import numpy as np
import pytest

from jpeggpu_tpu import parse
from jpeggpu_tpu.encoder import EncodeSpec, encode
from jpeggpu_tpu.errors import JpegError


def test_random_bytes_never_crash():
    rng = np.random.default_rng(0)
    for i in range(50):
        blob = rng.integers(0, 256, rng.integers(0, 200), dtype=np.uint8)
        with pytest.raises(JpegError):
            parse(blob.tobytes())


def test_mutated_headers_never_crash(test_image):
    data = bytearray(encode(test_image))
    rng = np.random.default_rng(1)
    header_len = data.index(b"\xff\xda") + 2  # up to SOS
    for _ in range(60):
        mutated = bytearray(data)
        for _ in range(3):
            pos = rng.integers(2, header_len)
            mutated[pos] = rng.integers(0, 256)
        try:
            parse(bytes(mutated))
        except JpegError:
            pass  # clean rejection is the contract


def test_truncated_scan_decodes_deterministically(test_image):
    """A truncated entropy stream must decode without crashing, identically
    on device and golden (zero-padding semantics)."""
    jax = pytest.importorskip("jax")
    from jpeggpu_tpu import golden
    from jpeggpu_tpu.pipeline import decode_jpeg_device

    data = encode(test_image, EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)]))
    # drop the last 30% of the scan body, keep EOI so the parser accepts it
    s = parse(data)
    scan = s.scans[0]
    cut = scan.begin + (scan.end - scan.begin) * 7 // 10
    # ensure the cut does not land inside a 0xFF pair
    raw = bytearray(data[:cut])
    if raw[-1] == 0xFF:
        raw.pop()
    truncated = bytes(raw) + b"\xff\xd9"
    g = golden.decode(truncated)
    d = decode_jpeg_device(truncated)
    for a, b in zip(g, d):
        assert np.array_equal(a, b)


def test_garbage_scan_body_decodes_deterministically(test_image):
    jax = pytest.importorskip("jax")
    from jpeggpu_tpu import golden
    from jpeggpu_tpu.pipeline import decode_jpeg_device

    data = encode(test_image[..., 0])
    s = parse(data)
    scan = s.scans[0]
    rng = np.random.default_rng(2)
    body = rng.integers(0, 255, scan.end - scan.begin, dtype=np.uint8)
    body[body == 0xFF] = 0x7F  # avoid creating markers
    garbled = data[:scan.begin] + body.tobytes() + data[scan.end:]
    g = golden.decode(garbled)
    d = decode_jpeg_device(garbled)
    for a, b in zip(g, d):
        assert np.array_equal(a, b)


def test_dnl_segment_is_skipped(test_image):
    """A DNL segment after the scan (T.81 B.2.5) is skipped like any other
    unknown-length construct (reference skip_segment path)."""
    jax = pytest.importorskip("jax")
    from jpeggpu_tpu import golden
    from jpeggpu_tpu.pipeline import decode_jpeg_device

    data = encode(test_image, EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)]))
    # insert DNL (FFDC, length 4, 16-bit line count) just before EOI
    assert data[-2:] == b"\xff\xd9"
    dnl = b"\xff\xdc\x00\x04" + (45).to_bytes(2, "big")
    patched = data[:-2] + dnl + data[-2:]
    ref = golden.decode(data)
    g = golden.decode(patched)
    d = decode_jpeg_device(patched)
    for a, b, c in zip(ref, g, d):
        assert np.array_equal(a, b)
        assert np.array_equal(a, c)


def test_dangling_trailing_rst(test_image):
    """A scan whose body ends in a dangling RST marker (creating an empty
    final restart segment) decodes identically to the clean stream on both
    golden and device paths."""
    jax = pytest.importorskip("jax")
    from jpeggpu_tpu import golden
    from jpeggpu_tpu.pipeline import decode_jpeg_device

    data = encode(test_image, EncodeSpec(
        sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=2))
    s = parse(data)
    scan = s.scans[0]
    n_seg = scan.num_segments
    # append one more RST marker at the end of the scan body
    patched = data[:scan.end] + b"\xff\xd0" + data[scan.end:]
    s2 = parse(patched)
    assert s2.scans[0].num_segments == n_seg + 1
    assert s2.scans[0].segments[-1, 1] == 0  # empty trailing segment
    ref = golden.decode(data)
    g = golden.decode(patched)
    d = decode_jpeg_device(patched)
    for a, b, c in zip(ref, g, d):
        assert np.array_equal(a, b)
        assert np.array_equal(a, c)


def test_debug_mode_cross_checks(test_image):
    jax = pytest.importorskip("jax")
    from jpeggpu_tpu import Decoder, debug

    data = encode(test_image)
    debug.set_debug(True)
    try:
        with Decoder() as d:
            d.parse_header(data)
            planes = d.decode()  # raises InternalError on divergence
            assert planes[0].shape == (45, 67)
    finally:
        debug.set_debug(False)


def test_debug_sync_invariants_fire(test_image, monkeypatch):
    """The debug-mode numeric-invariant sanitizer raises InternalError when
    the synchronized states are corrupted (here: zig-zag index pushed
    outside the data unit)."""
    pytest.importorskip("jax")
    from jpeggpu_tpu import Decoder
    from jpeggpu_tpu.errors import InternalError
    from jpeggpu_tpu.ops import huffman as H

    real_sync = H.sync_states

    def corrupted(cfg, arrs, ctx, *a, **k):
        p, c, z, n = real_sync(cfg, arrs, ctx, *a, **k)
        return p, c, z + 64, n

    data = encode(test_image)
    d = Decoder()
    d.parse_header(data)
    d._sync_invariant_checks()  # clean states pass
    monkeypatch.setattr(H, "sync_states", corrupted)
    with pytest.raises(InternalError, match="zig-zag"):
        d._sync_invariant_checks()
    d.cleanup()


def test_profile_trace_writes_xplane(test_image, tmp_path):
    """debug.profile_trace captures a jax.profiler trace of a decode (the
    SURVEY §5 tracing hook); the decode inside the trace stays bit-exact."""
    from jpeggpu_tpu import decode, debug, golden

    data = encode(test_image)
    ref = golden.decode(data)
    with debug.profile_trace(str(tmp_path)):
        planes = decode(data)
    assert all(np.array_equal(a, b) for a, b in zip(ref, planes))
    traces = [f for f in tmp_path.rglob("*") if f.suffix == ".pb"]
    assert traces, "no trace protobuf written"
