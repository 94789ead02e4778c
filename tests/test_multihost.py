"""Multi-host (multi-process) decode wiring: jax.distributed + spanning mesh.

Uses the weak-scaling harness at N=2 localhost processes; bit-exactness vs
the golden decoder is asserted inside each worker (scripts/weakscale.py).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_decode(tmp_path):
    out = tmp_path / "multihost.json"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "weakscale.py"),
         "--nproc", "2", "--imgs", "2", "--iters", "1",
         "--out", str(out)],
        capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    table = json.loads(out.read_text())
    (r,) = [x for x in table["results"] if x["nproc"] == 2]
    assert r["per_process_s"] > 0


def test_four_process_mixed_counts(tmp_path):
    """Mixed per-host batch sizes at N=4: decode() pads each host's local
    batch to the allgathered global maximum (SPMD executables must agree
    across processes) and returns only the real results; each worker
    asserts bit-exactness vs the golden decoder for its own images."""
    out = tmp_path / "mixed.json"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "weakscale.py"),
         "--nproc", "4", "--imgs", "1,2,2,3", "--iters", "1",
         "--out", str(out)],
        capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-2000:]
    table = json.loads(out.read_text())
    (r,) = table["results"]
    assert r["nproc"] == 4 and r["per_process_s"] > 0
