"""Skew mitigation: salted joins.

AQE's skew-join handles most cases by splitting oversized partitions, but
it only applies to sort-merge joins and after-the-fact. For *known* skewed
keys (the classic null/default-key hot spot, or a power-law key), salting
re-shapes the problem before the shuffle: the skewed side's rows spread
across S sub-keys, the other side replicates S ways, and every shuffle
partition is bounded by |hot key| / S.

Cost model: replicating the small side S× is cheap when it broadcastable-ish;
use S ≈ (hot key rows) / (target partition rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over ``salts`` buckets.

    ``other`` (the bounded side) is replicated ``salts`` times; the join key
    becomes (key, salt). Output columns = skewed ∪ other minus the duplicate
    key, exactly like ``skewed.join(other, on, how)`` — for the SUPPORTED
    join types only: inner / left / left_semi / left_anti, where every
    output row is anchored to a ``skewed`` row (which carries exactly one
    salt). right/full/cross are rejected: an unmatched ``other`` row exists
    once per salt replica and would be emitted ``salts`` times.

    The salt is derived from a per-row spray (hash of a monotonic id), NOT
    from data columns — any distribution is correct, uniform is best.
    """
    supported = {"inner", "left", "leftouter", "left_outer", "left_semi",
                 "leftsemi", "left_anti", "leftanti"}
    if how.lower().replace("_", "") not in {s.replace("_", "") for s in supported}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}: "
            "unmatched rows of the replicated side would be duplicated per salt"
        )
    salted = skewed.withColumn(
        "__salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salts))
    )
    replicated = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    out = salted.join(replicated, [on, "__salt"], how)
    return out.drop("__salt")
