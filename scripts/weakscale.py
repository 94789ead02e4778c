"""Weak-scaling harness for multi-host decode (BASELINE.json: >=80% at N>=2).

Spawns N single-device processes on localhost, wires them with
jax.distributed, and runs the process-spanning MultiHostBatchDecoder with a
fixed per-process workload. Weak-scaling efficiency = t(1 process) /
t(N processes) for the same per-process work; decode has no cross-host
collectives, so the cost of N>1 is coordination only.

Usage:
  python scripts/weakscale.py [--nproc 1 2 4] [--imgs 4] [--iters 5]
                              [--out MULTIHOST.json]

Runs on the CPU backend (sanitized env) so it works on any box; the same
wiring drives TPU pods, where jax.distributed.initialize auto-detects the
cluster.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_WORKER_FLAG = "JPEGGPU_TPU_WEAKSCALE_WORKER"


def worker() -> int:
    import numpy as np

    nproc = int(os.environ["WS_NPROC"])
    pid = int(os.environ["WS_PID"])
    port = os.environ["WS_PORT"]
    # WS_IMGS may be a comma list indexed by pid (mixed per-host batch
    # sizes: MultiHostBatchDecoder pads to the global max internally)
    imgs_spec = os.environ["WS_IMGS"]
    if "," in imgs_spec:
        counts = [int(x) for x in imgs_spec.split(",")]
        imgs = counts[pid % len(counts)]
    else:
        imgs = int(imgs_spec)
    iters = int(os.environ["WS_ITERS"])
    size = int(os.environ["WS_SIZE"])

    from jpeggpu_tpu.parallel import multihost

    if nproc > 1:
        multihost.initialize(f"127.0.0.1:{port}", nproc, pid)
    import jax

    assert jax.process_count() == nproc, jax.process_count()

    from PIL import Image

    from jpeggpu_tpu.encoder import EncodeSpec, encode

    rng = np.random.default_rng(17)  # same geometry everywhere, same bucket
    base = rng.integers(0, 255, (9, 12, 3)).astype(np.uint8)
    w = -(-size // 16) * 16
    h = -(-(size * 3 // 4) // 16) * 16
    img = np.array(Image.fromarray(base).resize((w, h), Image.BILINEAR))
    datas = [encode(np.clip(img + i, 0, 255).astype(np.uint8),
                    EncodeSpec(sampling=[(2, 2), (1, 1), (1, 1)],
                               restart_interval=4))
             for i in range(imgs)]

    dec = multihost.MultiHostBatchDecoder()
    out = dec.decode(datas)  # compile + warmup
    assert len(out) == imgs and out[0][0].shape == (h, w)

    # correctness across the mesh: local results match the golden decoder
    from jpeggpu_tpu import golden

    for d, planes in zip(datas, out):
        ref = golden.decode(d)
        for a, b in zip(ref, planes):
            assert np.array_equal(a, b), "multi-host decode diverged"

    t0 = time.perf_counter()
    for _ in range(iters):
        dec.decode(datas)
    dt = (time.perf_counter() - t0) / iters
    if pid == 0:
        print(json.dumps({"nproc": nproc, "per_process_s": dt,
                          "imgs_per_process": imgs}), flush=True)
    return 0


def launch(nproc: int, imgs, iters: int, size: int) -> dict:
    port = str(29600 + nproc)
    ncpu = os.cpu_count() or 1
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.update({
            _WORKER_FLAG: "1",
            "WS_NPROC": str(nproc), "WS_PID": str(pid), "WS_PORT": port,
            "WS_IMGS": str(imgs), "WS_ITERS": str(iters),
            "WS_SIZE": str(size),
            "PYTHONPATH": REPO,  # drop the axon sitecustomize injection
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
            "JAX_COMPILATION_CACHE_DIR": "/tmp/jpeggpu_tpu_jaxcache",
        })
        # pin each worker to one core: on a real multi-host deployment each
        # process owns its host; oversubscribing this box's cores would
        # masquerade as DCN inefficiency
        cmd = [sys.executable, os.path.abspath(__file__)]
        if nproc <= ncpu:
            cmd = ["taskset", "-c", str(pid % ncpu)] + cmd
        procs.append(subprocess.Popen(
            cmd, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(f"worker failed (rc={p.returncode}):\n{se}")
    line = [ln for ln in outs[0][0].splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    if os.environ.get(_WORKER_FLAG) == "1":
        return worker()

    argv = sys.argv[1:]
    nprocs = [1, 2, 4]
    if "--nproc" in argv:
        i = argv.index("--nproc") + 1
        nprocs = []
        while i < len(argv) and not argv[i].startswith("--"):
            nprocs.append(int(argv[i]))
            i += 1
    imgs = argv[argv.index("--imgs") + 1] if "--imgs" in argv else "4"
    if "," not in imgs:
        imgs = int(imgs)
    iters = int(argv[argv.index("--iters") + 1]) if "--iters" in argv else 5
    size = int(argv[argv.index("--size") + 1]) if "--size" in argv else 136
    out_path = (argv[argv.index("--out") + 1] if "--out" in argv
                else os.path.join(REPO, "MULTIHOST.json"))

    results = []
    for n in nprocs:
        r = launch(n, imgs, iters, size)
        results.append(r)
        print(f"nproc={n}: {r['per_process_s'] * 1e3:.1f} ms/iter "
              f"({imgs} imgs/process)", file=sys.stderr, flush=True)
    base = results[0]["per_process_s"]
    table = {
        "harness": "localhost multi-process CPU, jax.distributed",
        "imgs_per_process": imgs,
        "image_width": size,
        "iters": iters,
        "results": [
            {**r, "weak_scaling_efficiency":
                round(base / r["per_process_s"], 4)}
            for r in results
        ],
    }
    with open(out_path, "w") as f:
        json.dump(table, f, indent=1)
    print(json.dumps(table["results"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
