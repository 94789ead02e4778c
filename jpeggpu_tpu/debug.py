"""Debug/consistency mode: the analog of the reference's `is_debug` global
(defs.hpp:105-106), which enables synchronous device-vs-host consistency
checks (decode_destuff.cu:242-253, :328-341).

When enabled:
- the segment table invariants are re-verified after parsing,
- if the plan uses device-side destuffing, its output is compared against
  the host destuffer,
- small images (<= 2 MP) are cross-checked bit-for-bit against the golden
  CPU decoder.

All checks raise :class:`jpeggpu_tpu.errors.InternalError` on mismatch.
"""

from __future__ import annotations

import contextlib

_enabled = False


def set_debug(enabled: bool) -> None:
    global _enabled
    _enabled = bool(enabled)


def is_debug() -> bool:
    return _enabled


DEBUG_GOLDEN_MAX_PIXELS = 2_000_000


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a ``jax.profiler`` device trace of the enclosed decodes.

    Decode stages appear under ``jpeggpu.*`` named scopes (sync, write.*,
    dc, deinterleave, idct*). View with TensorBoard or Perfetto
    (``xprof``/trace-viewer on the written directory). The SURVEY §5
    tracing hook; ``bench.py --profile DIR`` wraps its timed loop in this.
    """
    import jax

    with jax.profiler.trace(log_dir):
        yield
