"""Vectorized scalar-function library (hashing, sketches, text stats).

Engine analog of the reference's scattered scalar kernels catalogued in
SURVEY.md §2.9 — every function here operates on whole Arrow/numpy columns,
never row-at-a-time in the hot path.
"""
