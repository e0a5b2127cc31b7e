"""Structured Streaming ingest into the same tiling/cell kernels."""
