"""Record SHARDED_12MP.json: a 12 MP no-restart JPEG decoded exactly on an
8-way subsequence-sharded mesh (tail fully sharded; planes return
row-sharded). Runs on the CPU backend with 8 virtual devices so it works on
any box; the same shard_map drives TPU meshes.

Usage: python scripts/sharded12mp.py [--devices N] [--out SHARDED_12MP.json]
"""

from __future__ import annotations

import io
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    n_dev = 8
    out_path = os.path.join(REPO, "SHARDED_12MP.json")
    argv = sys.argv[1:]
    if "--devices" in argv:
        n_dev = int(argv[argv.index("--devices") + 1])
    if "--out" in argv:
        out_path = argv[argv.index("--out") + 1]

    if os.environ.get("JPEGGPU_SHARDED12MP_CHILD") != "1":
        # sanitized CPU env with N virtual devices (conftest.py rationale)
        env = dict(os.environ)
        env["JPEGGPU_SHARDED12MP_CHILD"] = "1"
        env["PYTHONPATH"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_force_host_platform_device_count={n_dev}").strip()
        os.execvpe(sys.executable, [sys.executable] + sys.argv, env)

    import numpy as np
    from PIL import Image

    import jax
    from jpeggpu_tpu import golden
    from jpeggpu_tpu.parallel import make_mesh
    from jpeggpu_tpu.parallel.segments import decode_sharded
    from jpeggpu_tpu.reader import parse

    img = Image.open("/root/reference/images/IMG_6510.JPG")
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=90)  # PIL writes no restart markers
    data = buf.getvalue()
    stream = parse(data)
    assert stream.scans[0].num_segments == 1, "expected a no-restart scan"
    mp = stream.size_x * stream.size_y / 1e6

    mesh = make_mesh()
    assert mesh.devices.size == n_dev, mesh
    out = decode_sharded(data, mesh)
    ref = golden.decode(data)
    exact = all(np.array_equal(a, b) for a, b in zip(ref, out))
    rec = {
        "image": "IMG_6510 re-encoded (PIL, no restart) q90",
        "mp": round(mp, 2),
        "devices": n_dev,
        "granularity": "subsequence",
        "tail": "sharded (reduce_scatter row chunks; seam-aware DC; "
                "per-shard deinterleave+IDCT)",
        "exact": bool(exact),
    }
    with open(out_path, "w") as f:
        json.dump(rec, f)
        f.write("\n")
    print(json.dumps(rec))
    return 0 if exact else 1


if __name__ == "__main__":
    sys.exit(main())
