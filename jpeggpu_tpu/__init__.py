"""jpeggpu_tpu: TPU-native baseline-JPEG decoding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the CUDA
library nolmoonen/jpeggpu: host-side marker parsing and table derivation,
device-side destuffing, subsequence-parallel speculative Huffman decoding
with self-synchronization, DC prefix-sums, MCU de-interleaving and integer
dequantize+IDCT — plus batched, multi-chip decode via jax.sharding.
"""

from .config import Tuning, default_tuning, set_default_tuning
from .errors import (
    IncompleteBitstream,
    InternalError,
    InvalidArgument,
    InvalidJpeg,
    JpegError,
    NotSupported,
    OutOfHostMemory,
    Status,
    get_status_string,
)
from .reader import JpegStream, parse

__all__ = [
    "IncompleteBitstream",
    "InternalError",
    "InvalidArgument",
    "InvalidJpeg",
    "JpegError",
    "JpegStream",
    "NotSupported",
    "OutOfHostMemory",
    "Status",
    "Tuning",
    "default_tuning",
    "set_default_tuning",
    "Decoder",
    "ImgInfo",
    "decode",
    "decode_rgb",
    "get_status_string",
    "parse",
]


def __getattr__(name):
    # lazy: importing the API pulls in jax; keep host-only imports light
    if name in ("Decoder", "ImgInfo", "decode", "decode_rgb", "is_css_444"):
        from . import api

        return getattr(api, name)
    if name in ("golden", "debug", "encoder"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
