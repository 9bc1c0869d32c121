"""Numerology and reference tables for DAB transmission modes I-IV.

Everything in this package is pure NumPy (no device dependency) so tables can
be precomputed at trace time and baked into jitted programs as constants.
"""
