"""Compute ops: field preprocessing, interpolation, ray-march cores, kernels."""

from . import fields, interp, march

__all__ = ["fields", "interp", "march"]
