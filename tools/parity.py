"""Driver-mimic parity harness: run queries() vs oracle_sql() and compare.

Replicates the driver's correctness gate locally (row count + schema names +
order-insensitive value comparison, columns sorted by name) so oracle
mismatches surface before a round ends.

Usage:
    python tools/parity.py [--sf-dir /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalize(value):
    import datetime

    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        import os
        nd = os.environ.get("PARITY_FLOAT_DIGITS")
        return round(value, int(nd)) if nd else value
    if isinstance(value, datetime.datetime):
        return value.replace(tzinfo=None).isoformat()
    if isinstance(value, datetime.date):
        return value.isoformat()
    if isinstance(value, list):
        return tuple(normalize(v) for v in value)
    if isinstance(value, dict):
        return tuple(sorted((k, normalize(v)) for k, v in value.items()))
    return value


def rows_to_multiset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = {}
    for row in rows:
        key = tuple(normalize(row[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def compare(name, spark_df, duck_rel) -> list[str]:
    problems = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = list(duck_rel.columns)
    d_rows = duck_rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}")
    sm = rows_to_multiset(s_cols, s_rows)
    dm = rows_to_multiset(d_cols, d_rows)
    if sm != dm:
        only_s = [k for k in sm if sm[k] != dm.get(k, 0)][:3]
        only_d = [k for k in dm if dm[k] != sm.get(k, 0)][:3]
        problems.append(f"value mismatch; spark-side examples={only_s} duck-side examples={only_d}")
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--json-out",
        help="write a per-query result artifact (PARITY_r{N}.json) so "
        "builder-claimed greens are diffable against driver-confirmed ones",
    )
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import duckdb

    from pulsar_cdc_experiment_spark import registry
    from pulsar_cdc_experiment_spark.session import get_spark

    spark = get_spark(app_name="parity")
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    # the FULL registry, not __spark_entry__.queries(): the driver
    # surface excludes the by-design rows-only tier (round-14 policy),
    # but parity remains the artifact that exercises ALL of it
    registry.load_all_query_modules()
    queries = dict(registry.QUERIES)
    oracles = dict(registry.ORACLES)
    names = args.queries or list(queries)

    failed = []
    results: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        try:
            df = queries[name](spark, args.sf_dir)
            if name not in oracles:
                n = df.count()
                print(f"  {name}: rows-only ({n} rows) [{time.time()-t0:.1f}s]")
                results[name] = {
                    "status": "rows_only",
                    "spark_rows": n,
                    "secs": round(time.time() - t0, 1),
                }
                continue
            rel = con.sql(oracles[name])
            problems = compare(name, df, rel)
        except Exception as exc:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(exc).__name__}: {exc}"]
        if problems:
            failed.append(name)
            print(f"  {name}: FAIL [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"  {name}: ok [{time.time()-t0:.1f}s]")
        results[name] = {
            "status": "FAIL" if problems else "ok",
            "problems": problems or None,
            "secs": round(time.time() - t0, 1),
        }

    print(f"\n{len(names)-len(failed)}/{len(names)} matched; failing: {failed}")
    if args.json_out:
        import json

        with open(args.json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": args.sf_dir,
                    "n_queries": len(names),
                    "n_matched": len(names) - len(failed),
                    "failing": failed,
                    "results": results,
                },
                fh,
                indent=1,
            )
        print(f"wrote {args.json_out}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
