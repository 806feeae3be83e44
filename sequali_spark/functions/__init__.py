"""Vectorized per-document kernels and models (shared Spark <-> oracle)."""
