"""Scalar/column function groups: normalization, text, vectors, JSON."""
