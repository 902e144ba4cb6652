"""Scalar function library: Catalyst-first, Arrow-vectorized where Python
is unavoidable."""
