"""Bounded-memory frequent-items sketching (Misra-Gries) over DataFrames.

The two-pass distributed heavy-hitter pattern:

1. **Candidate pass** — each partition maintains a Misra-Gries summary of
   at most ``capacity`` counters (Arrow-batched via ``mapInPandas``, state
   carried across the partition's batch iterator). MG's guarantee: any
   item whose count within the partition exceeds ``n_p / (capacity+1)``
   survives the summary. By pigeonhole, an item whose GLOBAL count exceeds
   ``n / (capacity+1)`` must exceed that ratio in at least one partition,
   so the UNION of per-partition candidate sets is a superset of the true
   frequent items — no merge step needed for the superset property.
2. **Exact recount** — a left-semi join prunes the stream down to
   candidates only, then an exact groupBy count + threshold filter removes
   every false positive. The final answer is EXACT (hence fully
   SQL-oracle-checkable), while the shuffle carries only candidate rows:
   at 100 TB the full-vocabulary groupBy this replaces would shuffle every
   distinct token; this shuffles at most ``capacity × partitions`` keys'
   worth of pre-aggregated counts.

Reference analog: frequency/completeness profiling over the CDC feed the
reference enriches row-at-a-time (SURVEY §2 A12); here it is the corpus
heavy-hitter profile a training-data pipeline runs before vocabulary or
filter-list decisions.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

from pyspark.sql import DataFrame


def mg_candidates(df: DataFrame, col: str, capacity: int = 40) -> DataFrame:
    """Per-partition Misra-Gries candidate extraction.

    Returns a DataFrame with a single ``col`` column holding every item
    that survived ANY partition's summary (distinct). The summary update
    is the standard mergeable form (Agarwal et al., "Mergeable summaries"):
    add the batch's exact value counts, and when more than ``capacity``
    counters remain, subtract the (capacity+1)-th largest count from all
    and drop the non-positive ones — the batched equivalent of MG's
    decrement step, with the same ``n_p/(capacity+1)`` undercount bound.
    """
    import pandas as pd

    def summarize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cnt: Counter = Counter()
        for pdf in batches:
            vc = pdf[col].value_counts()
            cnt.update(vc.to_dict())
            if len(cnt) > capacity:
                kth = sorted(cnt.values(), reverse=True)[capacity]
                cnt = Counter(
                    {item: c - kth for item, c in cnt.items() if c > kth}
                )
        yield pd.DataFrame({col: pd.Series(list(cnt.keys()), dtype=object)})

    return df.select(col).mapInPandas(summarize, schema=f"{col} string").distinct()
