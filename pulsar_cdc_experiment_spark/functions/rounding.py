"""Cross-engine deterministic rounding.

Spark's ``round`` on DOUBLE goes through BigDecimal(HALF_UP on the shortest
decimal representation); DuckDB's multiplies by 10^n and half-away rounds the
*float* product. On boundary values (e.g. 49574.424999999996 → ×100 lands on
4957442.5 exactly in IEEE754) the two disagree by one cent.

The driver hash-compares raw values, so both sides must round the SAME way:
``floor(x * scale + 0.5) / scale`` — every step is an exact IEEE754 operation
both engines implement identically, so results match bit-for-bit. (This is a
correctness-harness convention, not a claim that half-up-toward-+inf is the
right financial rounding.)

Validity precondition: ``|x| * scale < 2^53`` — beyond the double integer
range, floor's argument loses integer resolution and the convention is
meaningless. Every registered query satisfies this with orders of magnitude
to spare (largest: monetary sums ~1e9 at n=2 → 1e11; ratios ≤ 1e2 at n=6 →
1e8). Property-tested against DuckDB in tests/test_properties.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rn(col: Column, n: int = 2) -> Column:
    """Round a double column to ``n`` places, DuckDB-reproducibly."""
    scale = float(10**n)
    return F.floor(col * scale + F.lit(0.5)) / scale


def rn_sql(expr: str, n: int = 2) -> str:
    """The identical rounding as DuckDB SQL text."""
    scale = 10**n
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
