"""Host parser unit tests (reader.py), mirroring the reference's validation
rules (reader.cpp, cited per test)."""

import numpy as np
import pytest

from jpeggpu_tpu import constants as C
from jpeggpu_tpu.encoder import EncodeSpec, encode
from jpeggpu_tpu.errors import IncompleteBitstream, InvalidJpeg, NotSupported
from jpeggpu_tpu.reader import parse


def _simple_jpeg(img=None, **kw):
    if img is None:
        img = np.full((16, 24), 128, np.uint8)
    return encode(img, EncodeSpec(**kw)) if kw else encode(img)


def test_parse_geometry(test_image):
    data = encode(test_image, EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)]))
    s = parse(data)
    assert (s.size_x, s.size_y) == (67, 45)
    assert s.num_components == 3
    assert (s.components[0].ss_x, s.components[0].ss_y) == (2, 2)
    # A.1.1 component sizes
    assert (s.components[0].size_x, s.components[0].size_y) == (67, 45)
    assert (s.components[1].size_x, s.components[1].size_y) == (34, 23)
    scan = s.scans[0]
    assert scan.num_data_units_in_mcu == 6
    assert (scan.num_mcus_x, scan.num_mcus_y) == (5, 3)
    # data sizes padded to MCU multiples
    assert (scan.components[0].data_size_x, scan.components[0].data_size_y) == (80, 48)
    assert (scan.components[1].data_size_x, scan.components[1].data_size_y) == (40, 24)


def test_single_component_forces_ss1():
    # reader.cpp:147-153
    img = np.full((8, 8), 10, np.uint8)
    s = parse(encode(img))
    assert (s.components[0].ss_x, s.components[0].ss_y) == (1, 1)


def test_segment_accounting(test_image):
    data = encode(test_image, EncodeSpec(
        sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=2))
    s = parse(data)
    scan = s.scans[0]
    assert s.restart_interval == 2
    assert scan.num_segments == -(-scan.num_mcus // 2)
    # segment table is consistent: offsets are the running sum of counts
    seg = scan.segments
    assert seg[0, 0] == 0
    assert np.all(seg[1:, 0] == np.cumsum(seg[:-1, 1]))
    assert seg[:, 1].sum() == scan.num_subsequences


def test_non_interleaved_mcu_is_one_data_unit(test_image):
    data = encode(test_image, EncodeSpec(
        sampling=[(2, 2), (1, 1), (1, 1)], interleaved=False))
    s = parse(data)
    assert len(s.scans) == 3
    for scan in s.scans:
        assert scan.num_data_units_in_mcu == 1  # T.81 A.2.2
    # luma scan covers the full padded plane as 8x8 units
    assert s.scans[0].num_mcus == (72 // 8) * (48 // 8)


def test_missing_soi():
    with pytest.raises(InvalidJpeg):
        parse(b"\x00\x01\x02")


def test_truncated():
    data = _simple_jpeg()
    with pytest.raises((InvalidJpeg, IncompleteBitstream)):
        parse(data[:20])


def test_progressive_rejected():
    data = bytearray(_simple_jpeg())
    # rewrite SOF0 marker to SOF2 (progressive)
    i = data.find(bytes([0xFF, C.MARKER_SOF0]))
    data[i + 1] = C.MARKER_SOF2
    with pytest.raises(NotSupported):
        parse(bytes(data))


def test_qtables_stored_natural_order():
    data = _simple_jpeg()
    s = parse(data)
    # DC quant value (natural index 0) equals Annex-K luma scaled value
    from jpeggpu_tpu.encoder import scale_qtable
    from jpeggpu_tpu.tables import STD_QUANT_LUMA
    q = scale_qtable(STD_QUANT_LUMA, 85)
    assert s.qtables[0][0] == q.reshape(64)[0]
    assert np.array_equal(s.qtables[0].reshape(8, 8), q)


def test_huffman_table_derivation():
    from jpeggpu_tpu.tables import STD_DC_LUMA, build_huffman_table
    t = build_huffman_table(*STD_DC_LUMA)
    # Annex K DC luma: 12 symbols, lengths 2..9, first codes canonical
    assert t.num_symbols == 12
    assert t.maxcode[0] == -1  # no length-1 codes
    assert t.maxcode[1] == 0b00  # one length-2 code (symbol 0)
    # LUT roundtrip: every 8-bit prefix of a short code decodes to it
    from jpeggpu_tpu.tables import decode_category_scalar
    val, ln = decode_category_scalar(t, 0b00 << 30)
    assert (val, ln) == (0, 2)


def test_fill_bytes_before_marker():
    data = _simple_jpeg()
    # insert fill 0xFF before EOI (B.1.1.2)
    assert data[-2:] == bytes([0xFF, C.MARKER_EOI])
    padded = data[:-2] + b"\xff\xff" + data[-2:]
    s = parse(padded)
    assert s.num_components == 1


def test_four_component_stream():
    img = np.full((16, 16), 100, np.uint8)
    planes = [img, img, img, img]
    data = encode(planes, EncodeSpec(sampling=[(1, 1)] * 4))
    s = parse(data)
    assert s.num_components == 4
    assert len(s.scans) == 1
    assert s.scans[0].num_data_units_in_mcu == 4
