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

_enabled = False


def set_debug(enabled: bool) -> None:
    global _enabled
    _enabled = bool(enabled)


def is_debug() -> bool:
    return _enabled


DEBUG_GOLDEN_MAX_PIXELS = 2_000_000
