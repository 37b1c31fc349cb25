"""Pure interval-containment join (NO equi key) via bin bucketing.

``join_range`` (queries/relational.py) band-joins WITH an equi key — the
planner hash-joins on the key and post-filters the band, which scales.
The shape Spark has no native answer for is the KEYLESS containment join:
``points.t BETWEEN intervals.start AND intervals.end`` with nothing to
hash on — the planner's only plan is BroadcastNestedLoopJoin (fine for a
small interval table, O(|points|·|intervals|) death at 100 TB when the
intervals side is data-proportional).

The classic fix, implemented here: pick a bin width ``W``, bucket points
into ``floor(t/W)``, explode each interval into the bins it touches,
equi-join on the bin, and post-filter exact containment. Every true
(point, interval) pair shares a bin — the point's single bin lies within
the interval's touched bins — so the equi-join loses nothing, and each
pair is produced exactly once (the point has ONE bin; the interval lists
each bin once). Cost: one shuffle on the bin key + a bounded per-interval
explode, instead of a cross product.

Bin sizing (round 8 — ``max_bins`` generalization): ``W`` no longer has
to cover the LONGEST interval. An interval of width ``w`` explodes into
``≤ ceil(w/W)+1`` bins, capped in-plan at ``max_bins``; a point in bin
``b`` meets every interval touching ``b``, so the candidate set per point
is the intervals overlapping its ``W``-wide bin. The trade:

* ``W`` too LARGE (the old longest-interval rule with one outlier):
  every point's candidate set spans a huge bin — candidates ≫ matches.
* ``W`` too SMALL: long intervals explode into many bins — interval-side
  row expansion.

Decision rule (SCALE.md "Keyless interval join"): size ``W`` to the
TYPICAL interval width, then set ``max_bins ≥ ceil(longest/W)+1`` so the
rare long interval pays a bounded explode instead of taxing every
point's candidate set. The in-plan guard still fails loudly on an
interval longer than ``(max_bins-1)·W`` rather than silently losing its
matches past the last exploded bin.

Reference analog: the enrichment function's event-time windows are the
degenerate one-sided case (cdc_enrichment_function.py:60-66 routes by
time); a true interval dimension (maintenance windows, promo periods,
incident spans) needs this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.time import epoch_micros

MICROS_PER_DAY = 86_400 * 1_000_000


def interval_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    t_col: str,
    start_col: str,
    end_col: str,
    bin_micros: int,
    validate: bool = True,
    max_bins: int = 2,
) -> DataFrame:
    """Inner-join ``points`` to every interval containing them
    (half-open: ``start <= t < end``) without an equi key.

    PRECONDITION: every interval must be well-formed (``start <= end``)
    and no longer than ``(max_bins - 1) * bin_micros`` — that is what
    bounds the explode at ``max_bins`` bins and guarantees no pair is
    missed. The default ``max_bins=2`` is the classic
    width-must-fit-one-bin contract; raise it when interval widths are
    mixed so ``bin_micros`` can track the TYPICAL width while outliers
    explode into up to ``max_bins`` bins (module docstring has the
    sizing rule). ``validate=True`` (default) enforces the bound
    in-plan with ``assert_true`` — a violating interval fails the job
    loudly instead of silently losing matches past the last exploded
    bin (too long) or exploding into a descending half-million-bin
    sequence (inverted; round-7 review catch). NULL-bounded intervals
    match nothing, exactly like the naive theta join (NULL comparisons
    are false), under either validate setting.

    Output columns: points.* then intervals.* (helper columns dropped;
    a caller column that collides with a helper name raises).
    """
    if max_bins < 2:
        raise ValueError(f"max_bins must be >= 2, got {max_bins}")
    helpers = ("__bin", "__t_us", "__s_us", "__e_us")
    for df, side in ((points, "points"), (intervals, "intervals")):
        clash = sorted(set(df.columns) & set(helpers))
        if clash:
            raise ValueError(
                f"{side} carries reserved helper column(s) {clash}; rename"
            )

    # compute the point epoch ONCE: reused by the bin key and the
    # containment filter (a bare re-resolve of t_col after the join is
    # ambiguous when intervals happens to carry a same-named column)
    p = points.withColumn("__t_us", epoch_micros(F.col(t_col))).withColumn(
        "__bin", F.floor(F.col("__t_us") / F.lit(bin_micros)).cast("long")
    )

    iv = _explode_interval_bins(
        intervals, start_col, end_col, "__s_us", "__e_us",
        bin_micros, max_bins, validate,
    )

    joined = p.join(iv, "__bin").filter(
        (F.col("__t_us") >= F.col("__s_us"))
        & (F.col("__t_us") < F.col("__e_us"))
    )
    return joined.drop("__bin", "__t_us", "__s_us", "__e_us")


def _explode_interval_bins(
    df: DataFrame,
    start_col: str,
    end_col: str,
    s_h: str,
    e_h: str,
    bin_micros: int,
    max_bins: int,
    validate: bool,
) -> DataFrame:
    """Shared interval-side pipeline for both binned joins: epoch
    conversion into helper columns, NULL-bound drop, the width/inversion
    guard, and the explode into every touched bin (``__bin``).

    NULL bounds match nothing — filtered out BEFORE validation so the
    guard never aborts the job over a row the theta-join equivalence
    defines as simply unmatched. Under ``validate=True``, assert_true
    returns NULL when the predicate holds; filtering on isNull() keeps
    every row AND forces the check to evaluate (a withColumn+drop would
    be pruned away before it ever ran). The predicate is SELF-CONTAINED
    under NULL bounds (explicitly true when either bound is NULL) so
    correctness never depends on Catalyst evaluating the preceding
    isNotNull filter first after CombineFilters merges the conjuncts
    (round-7 ADVICE). One implementation on purpose (round-8 review):
    a guard fix landing in only one of the two joins would silently
    diverge their validation semantics."""
    out = df.withColumn(s_h, epoch_micros(F.col(start_col))).withColumn(
        e_h, epoch_micros(F.col(end_col))
    )
    out = out.filter(F.col(s_h).isNotNull() & F.col(e_h).isNotNull())
    if validate:
        width = F.col(e_h) - F.col(s_h)
        width_cap = (max_bins - 1) * bin_micros
        out = out.filter(
            F.assert_true(
                F.col(s_h).isNull()
                | F.col(e_h).isNull()
                | ((width >= 0) & (width <= F.lit(width_cap))),
                F.lit(
                    "interval inverted (end < start) or longer than "
                    f"(max_bins-1)*bin_micros = {width_cap}us"
                ),
            ).isNull()
        )
    else:
        # without the loud guard, still refuse to explode an inverted
        # interval into a descending bin sequence
        out = out.filter(F.col(s_h) <= F.col(e_h))
    # zero-width intervals contain/overlap NOTHING under half-open
    # semantics, and one starting exactly on a bin boundary would
    # explode into a descending 2-element sequence (sequence() steps -1
    # when start > stop) — guaranteed-dead join fan-in. Drop them here:
    # semantics-preserving for both joins, and the explode below is now
    # provably ascending (s <= e-1) — round-8 review.
    out = out.filter(F.col(s_h) < F.col(e_h))
    # half-open end: the bin of the last contained microsecond
    return out.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(s_h) / F.lit(bin_micros)).cast("long"),
                F.floor((F.col(e_h) - 1) / F.lit(bin_micros)).cast("long"),
            )
        ),
    )


def interval_overlap_join_binned(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_micros: int,
    validate: bool = True,
    max_bins: int = 2,
) -> DataFrame:
    """Inner-join LEFT intervals to every RIGHT interval they OVERLAP
    (non-empty half-open intersection: ``max(starts) < min(ends)``) —
    the interval×interval companion of :func:`interval_join_binned`
    (round 8), again with NO equi key, again BNLJ-free.

    Semantics note (surfaced by the hypothesis property test): this is
    the NON-EMPTY-INTERSECTION definition, which differs from the
    common 2-conjunct predicate ``s1 < e2 AND s2 < e1`` in exactly one
    case — a zero-width interval strictly inside another (the conjuncts
    hold, but the set intersection is empty). Here a zero-width
    interval overlaps NOTHING; for non-empty intervals on both sides
    the two definitions are provably identical, so SQL oracles written
    with the 2-conjunct form stay valid whenever widths are positive.

    Both sides explode into the bins they touch (each bounded by
    ``max_bins``, same precondition and in-plan guard as the
    point-in-interval join), equi-join on the bin, exact-overlap
    post-filter — and because an overlapping pair shares EVERY bin its
    intersection touches, the pair is DEDUPLICATED in-plan by keeping
    only the intersection's FIRST bin:
    ``__bin == floor(max(starts)/W)``, which equals
    ``max(floor(l_start/W), floor(r_start/W))`` (floor is monotone), a
    bin both sides provably list. Each true pair survives exactly once;
    no distinct/aggregate needed. Empty (zero-width) intervals overlap
    nothing, exactly like the naive theta join.

    Output columns: left.* then right.* (helper columns dropped; a
    caller column colliding with a helper name raises).
    """
    if max_bins < 2:
        raise ValueError(f"max_bins must be >= 2, got {max_bins}")
    helpers = ("__bin", "__ls_us", "__le_us", "__rs_us", "__re_us")
    for df, side in ((left, "left"), (right, "right")):
        clash = sorted(set(df.columns) & set(helpers))
        if clash:
            raise ValueError(
                f"{side} carries reserved helper column(s) {clash}; rename"
            )
    lf = _explode_interval_bins(
        left, l_start, l_end, "__ls_us", "__le_us",
        bin_micros, max_bins, validate,
    )
    rf = _explode_interval_bins(
        right, r_start, r_end, "__rs_us", "__re_us",
        bin_micros, max_bins, validate,
    )

    inter_start = F.greatest(F.col("__ls_us"), F.col("__rs_us"))
    inter_end = F.least(F.col("__le_us"), F.col("__re_us"))
    joined = (
        lf.join(rf, "__bin")
        .filter(inter_start < inter_end)  # non-empty half-open intersection
        # exactly-once: keep the intersection's first bin only
        .filter(
            F.col("__bin")
            == F.floor(inter_start / F.lit(bin_micros)).cast("long")
        )
    )
    return joined.drop("__bin", "__ls_us", "__le_us", "__rs_us", "__re_us")
