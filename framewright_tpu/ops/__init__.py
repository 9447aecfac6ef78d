"""Compute ops: tiling, metrics, warping, filters, hashing.

The framework's equivalents of the work the reference delegates to
external binaries and OpenCV — expressed as jit-friendly JAX functions
with static shapes (SURVEY.md §7 architecture shift).
"""
