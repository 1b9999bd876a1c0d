"""Scalar/text kernels: normalization, similarity, constant lookup tables."""
