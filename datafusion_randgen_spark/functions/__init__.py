"""Scalar function library: randgen parity UDFs, expression fast paths,
seeded deterministic generators, text/vector helpers."""
