"""Scalar function kernels (vectorized; no per-row Python UDFs)."""
