"""Device pipeline vs golden CPU decoder: bit-for-bit equality.

This is the core correctness property of the framework (BASELINE.json:
"Decoded output must match the reference decoder's integer pipeline
bit-for-bit on every baseline JPEG").
"""

import numpy as np
import pytest

from jpeggpu_tpu import golden
from jpeggpu_tpu.encoder import EncodeSpec, encode
from jpeggpu_tpu.pipeline import decode_jpeg_device


def _check(data):
    g = golden.decode(data)
    d = decode_jpeg_device(data)
    assert len(g) == len(d)
    for i, (a, b) in enumerate(zip(g, d)):
        assert a.shape == b.shape, (i, a.shape, b.shape)
        assert np.array_equal(a, b), (
            f"plane {i}: {np.count_nonzero(a != b)}/{a.size} mismatches")


SPECS = [
    ("444", dict(sampling=[(1, 1), (1, 1), (1, 1)])),
    ("422", dict(sampling=[(2, 1), (1, 1), (1, 1)])),
    ("420", dict(sampling=[(2, 2), (1, 1), (1, 1)])),
    ("440", dict(sampling=[(1, 2), (1, 1), (1, 1)])),
    ("411", dict(sampling=[(4, 1), (1, 1), (1, 1)])),
    ("mixed_ss", dict(sampling=[(2, 2), (2, 1), (1, 1)])),
    # non-divisor luma:chroma ratio (3:2): T.81 allows any factors 1..4;
    # exercises the encoder's fractional-area resample and edge-MCU
    # geometry where MCU width (24 px) straddles the image bound oddly
    ("nondivisor_ss", dict(sampling=[(3, 1), (2, 1), (1, 1)],
                           restart_interval=3)),
    ("ss_41_14", dict(sampling=[(4, 1), (1, 4), (1, 1)])),
    ("420_rst2", dict(sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=2)),
    ("420_rst7", dict(sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=7)),
    ("444_rst1", dict(sampling=[(1, 1), (1, 1), (1, 1)], restart_interval=1)),
    ("non_interleaved", dict(sampling=[(2, 2), (1, 1), (1, 1)], interleaved=False)),
    ("non_il_rst2", dict(sampling=[(2, 2), (1, 1), (1, 1)],
                         interleaved=False, restart_interval=2)),
    ("q10", dict(quality=10)),
    ("q99", dict(quality=99)),
    ("four_tables", dict(sampling=[(2, 2), (1, 1), (1, 1)],
                         table_ids=[(0, 0), (1, 1), (2, 2)])),
    # frequency-optimal tables (libjpeg optimize_coding analog): non-Annex-K
    # code lengths, exercises arbitrary-table decode incl. hv_rows sizing
    ("opt_huff", dict(sampling=[(2, 2), (1, 1), (1, 1)],
                      optimize_huffman=True)),
    ("opt_huff_rst", dict(sampling=[(2, 2), (1, 1), (1, 1)],
                          optimize_huffman=True, restart_interval=3)),
    ("opt_huff_q99", dict(quality=99, optimize_huffman=True)),
]


@pytest.mark.parametrize("name,kw", SPECS, ids=[s[0] for s in SPECS])
def test_bitexact(test_image, name, kw):
    _check(encode(test_image, EncodeSpec(**kw)))


@pytest.mark.parametrize("kw", [
    dict(sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=2),
    dict(optimize_huffman=True, quality=97),
])
def test_bitexact_tpu_symbol_formulations(test_image, kw):
    """The TPU-default symbol-loop formulations (select-tree huffval
    lookup + binary-search category decode), forced here on CPU, are
    bit-identical to golden — incl. frequency-optimized tables whose
    per-slot word counts differ from Annex K."""
    from jpeggpu_tpu.config import Tuning
    from jpeggpu_tpu.pipeline import build_plan, decode_jpeg_device
    from jpeggpu_tpu.reader import parse

    data = encode(test_image, EncodeSpec(**kw))
    plan = build_plan(parse(data), tuning=Tuning(hv_lookup="tree",
                                                 category="bsearch",
                                                 refill="shift"))
    d = decode_jpeg_device(data, plan=plan)
    g = golden.decode(data)
    assert all(np.array_equal(a, b) for a, b in zip(g, d))


def test_bitexact_lane2d_pallas():
    """The (8, w/8) lane-axis fold of the Pallas symbol-loop kernels
    (Tuning.lane2d, the TPU default with the tree/bsearch/shift combo) is
    bit-identical to golden in interpret mode. Small image + low unroll:
    interpret-mode tracing of the tree formulation is expensive."""
    from jpeggpu_tpu.config import Tuning
    from jpeggpu_tpu.ops import huffman_pallas as HP
    from jpeggpu_tpu.pipeline import build_plan, decode_jpeg_device
    from jpeggpu_tpu.reader import parse

    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (24, 16, 3)).astype(np.uint8)
    data = encode(img, EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)],
                                  restart_interval=2))
    tun = Tuning(hv_lookup="tree", category="bsearch", refill="shift",
                 entropy_backend="pallas", unroll=4)
    plan = build_plan(parse(data), tuning=tun)
    assert HP._use_2d(plan.signature.scans[0].cfg)
    d = decode_jpeg_device(data, plan=plan)
    g = golden.decode(data)
    assert all(np.array_equal(a, b) for a, b in zip(g, d))


def test_bitexact_gray(test_image):
    _check(encode(test_image[..., 0]))


def test_bitexact_gray_rst(test_image):
    _check(encode(test_image[..., 0], EncodeSpec(restart_interval=3)))


def test_bitexact_noise(noise_image):
    # dense, high-entropy stream: stresses subsequence symbol counts
    _check(encode(noise_image, EncodeSpec(quality=98)))


def test_bitexact_supertile_window_exceeds_count(noise_image):
    """Small dense scan where the expand window W exceeds the supertile
    count n_st: the window must clamp to n_st, otherwise the last
    supertile's rows are gathered (and summed) multiple times per group.
    super_w is forced above lanes//super_g via pad_scans."""
    from jpeggpu_tpu.pipeline import build_plan, decode_jpeg_device
    from jpeggpu_tpu.reader import parse

    data = encode(noise_image, EncodeSpec(quality=100))
    pad = (((0, 0, 0, 0, (0,) * 8, 32, 12),)
           * len(parse(data).scans))
    plan = build_plan(parse(data), pad_scans=pad)
    cfg = plan.signature.scans[0].cfg
    assert cfg.lanes // cfg.super_g < cfg.super_w, (
        "test no longer exercises n_st < W; shrink the image or raise "
        "the super_w floor")
    d = decode_jpeg_device(data, plan=plan)
    g = golden.decode(data)
    assert all(np.array_equal(a, b) for a, b in zip(g, d))


def test_bitexact_four_component(test_image):
    img = test_image
    planes = [img[..., 0], img[..., 1], img[..., 2], 255 - img[..., 0]]
    _check(encode(planes, EncodeSpec(sampling=[(1, 1)] * 4)))


def test_bitexact_four_component_non_interleaved(test_image):
    img = test_image
    planes = [img[..., 0], img[..., 1], img[..., 2], 255 - img[..., 0]]
    _check(encode(planes, EncodeSpec(sampling=[(1, 1)] * 4, interleaved=False)))


def test_bitexact_tiny():
    _check(encode(np.full((1, 1), 128, np.uint8)))


def test_bitexact_exact_mcu():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    _check(encode(img))


def test_bitexact_saturated_table():
    """A complete (saturated) Huffman code space forces the maxcode slow
    path; decode must stay bit-exact."""
    counts1 = np.zeros(16, np.uint8)
    counts1[0] = 2  # two 1-bit codes: code space saturates at length 1
    overrides = {
        (0, 0): (counts1, np.array([0, 1], np.uint8)),  # DC: cats 0,1
        (1, 0): (counts1, np.array([0x00, 0x11], np.uint8)),  # AC: EOB + (0,1)
    }
    img = np.full((24, 32), 127, np.uint8)  # flat: only cats 0/1 needed
    data = encode(img, EncodeSpec(huff_overrides=overrides, quality=50))
    from jpeggpu_tpu.pipeline import build_plan
    from jpeggpu_tpu.reader import parse
    plan = build_plan(parse(data))
    assert not plan.signature.scans[0].cfg.fast_tables
    _check(data)


def test_fast_tables_flag_default(test_image):
    from jpeggpu_tpu.pipeline import build_plan
    from jpeggpu_tpu.reader import parse
    data = encode(test_image)
    plan = build_plan(parse(data))
    assert plan.signature.scans[0].cfg.fast_tables


def test_bitexact_flat_image():
    # long EOB runs: few symbols, many positions per subsequence
    img = np.full((64, 96, 3), 200, np.uint8)
    _check(encode(img, EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)])))


def test_bitexact_per_scan_dht_redefinition(test_image):
    """A DHT between SOSs redefines the SAME table ids with different
    contents (T.81 allows this; cf. reference reader.cpp:434-441): the
    reader must snapshot tables per scan (reader.py) so each scan decodes
    with the tables in effect at ITS SOS, and the device pipeline must
    honor the per-scan snapshot bit-exactly."""
    from jpeggpu_tpu.reader import parse

    data = encode(test_image, EncodeSpec(
        sampling=[(1, 1), (1, 1), (1, 1)], interleaved=False,
        table_ids=[(0, 0)] * 3, dht_per_scan=True))
    s = parse(data)
    assert len(s.scans) == 3
    # the redefinition must be real: at least one later scan's snapshot of
    # table slot (DC 0 / AC 0) differs from scan 0's
    slots = [0 * 2 + 0, 0 * 2 + 1]  # id 0, HUFF_DC / HUFF_AC packed slots
    differs = any(
        not np.array_equal(s.scans[0].huff_tables[t].maxcode,
                           s.scans[k].huff_tables[t].maxcode)
        or not np.array_equal(s.scans[0].huff_tables[t].huffval,
                              s.scans[k].huff_tables[t].huffval)
        for k in (1, 2) for t in slots)
    assert differs, "encoder emitted identical tables; test is vacuous"
    _check(data)


def test_bitexact_per_scan_dht_with_restarts(test_image):
    """Per-scan table redefinition combined with restart intervals."""
    data = encode(test_image, EncodeSpec(
        sampling=[(1, 1), (1, 1), (1, 1)], interleaved=False,
        table_ids=[(0, 0)] * 3, dht_per_scan=True, restart_interval=5))
    _check(data)
