"""Spark DataFrame operators wrapping the core numpy kernels."""
