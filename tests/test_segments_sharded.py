"""Segment-sharded (sequence-parallel) single-image decode tests."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from jpeggpu_tpu import golden
from jpeggpu_tpu.encoder import EncodeSpec, encode
from jpeggpu_tpu.errors import NotSupported
from jpeggpu_tpu.parallel import make_mesh
from jpeggpu_tpu.parallel.segments import decode_sharded, plan_shards
from jpeggpu_tpu.pipeline import build_plan
from jpeggpu_tpu.reader import parse


def _big_image(seed=0, w=256, h=160):
    from PIL import Image
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (8, 12, 3)).astype(np.uint8)
    return np.array(Image.fromarray(base).resize((w, h), Image.BILINEAR))


def test_sharded_matches_golden():
    img = _big_image()
    data = encode(img, EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)],
                                  restart_interval=4))
    mesh = make_mesh(jax.devices()[:8], axis_name="seg")
    out = decode_sharded(data, mesh)
    ref = golden.decode(data)
    for a, b in zip(ref, out):
        assert np.array_equal(a, b)


def test_sharded_gray_uneven_segments():
    img = _big_image(seed=3)[..., 0]
    data = encode(img, EncodeSpec(restart_interval=37))  # uneven partition
    mesh = make_mesh(jax.devices()[:4], axis_name="seg")
    out = decode_sharded(data, mesh)
    ref = golden.decode(data)
    for a, b in zip(ref, out):
        assert np.array_equal(a, b)


def test_sharded_requires_enough_segments(test_image):
    data = encode(test_image)  # no restart markers: one segment
    plan = build_plan(parse(data))
    with pytest.raises(NotSupported):
        plan_shards(plan, 8)


def test_sharded_subseq_no_restart():
    """A restart-free image (one giant segment) shards at subsequence
    granularity with cross-shard boundary sync."""
    img = _big_image(seed=7, w=320, h=240)
    data = encode(img, EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)]))
    assert parse(data).scans[0].num_segments == 1
    mesh = make_mesh(jax.devices()[:8], axis_name="seg")
    out = decode_sharded(data, mesh)
    ref = golden.decode(data)
    for a, b in zip(ref, out):
        assert np.array_equal(a, b)


def test_sharded_subseq_few_segments():
    """2 segments across 8 devices: segment boundaries fall inside shards
    (both cross-shard seams and in-shard segment resets exercised)."""
    img = _big_image(seed=11, w=320, h=160)[..., 0]
    scan0 = parse(encode(img)).scans[0]
    # restart interval of half the MCUs -> exactly 2 segments
    ri = -(-scan0.num_mcus // 2)
    data = encode(img, EncodeSpec(restart_interval=ri))
    assert parse(data).scans[0].num_segments == 2
    mesh = make_mesh(jax.devices()[:8], axis_name="seg")
    out = decode_sharded(data, mesh)
    ref = golden.decode(data)
    for a, b in zip(ref, out):
        assert np.array_equal(a, b)


def test_sharded_multiscan_noninterleaved():
    """A 4-scan non-interleaved image decodes scan-by-scan on the mesh
    (VERDICT r2 #6); restart-free scans take the subsequence path."""
    rng = np.random.default_rng(13)
    planes = [np.asarray(_big_image(seed=17 + i, w=256, h=192)[..., 0])
              for i in range(4)]
    del rng
    data = encode(planes, EncodeSpec(sampling=[(1, 1)] * 4,
                                     interleaved=False))
    stream = parse(data)
    assert len(stream.scans) == 4
    mesh = make_mesh(jax.devices()[:8], axis_name="seg")
    out = decode_sharded(data, mesh)
    ref = golden.decode(data)
    for a, b in zip(ref, out):
        assert np.array_equal(a, b)


def test_shard_partition_covers_everything():
    img = _big_image(seed=5)
    data = encode(img, EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)],
                                  restart_interval=3))
    plan = build_plan(parse(data))
    shp = plan_shards(plan, 8)
    assert shp.bounds[0] == 0
    assert shp.bounds[-1] == plan.stream.scans[0].num_segments
    assert all(b2 > b1 for b1, b2 in zip(shp.bounds, shp.bounds[1:]))
    total = plan.signature.scans[0].cfg.total_positions
    assert sum(shp.real_positions) == total
