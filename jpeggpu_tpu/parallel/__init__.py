"""Batched and multi-chip decode (data-parallel over images/segments)."""

from .batch import BatchDecoder, decode_batch, make_mesh

__all__ = ["BatchDecoder", "decode_batch", "make_mesh"]
