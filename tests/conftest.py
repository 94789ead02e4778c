"""Test harness configuration.

Two jobs, both of which must happen before jax is (re)used:

1. CPU determinism: the preinstalled `axon` PJRT plugin (injected through
   PYTHONPATH sitecustomize) registers itself in *every* interpreter and
   intermittently deadlocks CPU-backend executions (observed ~50% of
   processes hang inside ArrayImpl._value with all worker threads idle).
   The plugin is already imported by the time pytest starts, so the only
   reliable fix is to re-exec the interpreter with a clean environment.

2. Fake multi-device mesh: sharding tests run on 8 virtual CPU devices via
   XLA_FLAGS=--xla_force_host_platform_device_count=8 (SURVEY.md §4).
"""

import os
import sys

_CHILD_FLAG = "JPEGGPU_TPU_TEST_CHILD"


def _needs_reexec() -> bool:
    if os.environ.get(_CHILD_FLAG) == "1":
        return False
    # axon plugin present (sitecustomize) or wrong platform default
    return "axon" in sys.modules or "axon" in os.environ.get("JAX_PLATFORMS", "")


if _needs_reexec():
    env = dict(os.environ)
    env[_CHILD_FLAG] = "1"
    env["PYTHONPATH"] = ""  # drop the axon sitecustomize injection
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jpeggpu_tpu_jaxcache")
    argv = [sys.executable, "-m", "pytest"] + sys.argv[1:]
    os.execvpe(sys.executable, argv, env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jpeggpu_tpu_jaxcache")

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="session")
def test_image():
    """A smooth-ish 67x45 RGB test image (non-multiple-of-MCU sizes)."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 255, (6, 8, 3)).astype(np.uint8)
    img = np.array(Image.fromarray(base).resize((67, 45), Image.BILINEAR))
    return np.clip(img + rng.normal(0, 6, img.shape), 0, 255).astype(np.uint8)


@pytest.fixture(scope="session")
def noise_image():
    """High-entropy image: stresses dense subsequences."""
    rng = np.random.default_rng(7)
    return rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
