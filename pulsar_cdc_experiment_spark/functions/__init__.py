"""Scalar function helpers shared by operators and driver queries."""

from .rounding import rn, rn_sql  # noqa: F401
