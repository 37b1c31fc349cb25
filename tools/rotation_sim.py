"""Simulate the per-round registry rotation salt (r19 verdict #9).

The driver samples the oracle-backed PREFIX-50 of the exposed registry;
``registry._ROTATION_SALT`` rotates the family round-robin each round so
never-sampled names land in that prefix (the salt changelog in
registry.py documents each round's pick). This tool makes the selection
re-runnable by anyone: it replays the EXACT interleave
``load_all_query_modules`` performs for any candidate salt, scores the
resulting prefix-50 against the union of committed CORRECTNESS_r*.json
samples, and verifies that the committed salt reproduces the live
registry ordering bit-for-bit.

Usage:
    python tools/rotation_sim.py                 # score committed salt
    python tools/rotation_sim.py --scan 30000    # scan salts 0..N-1,
                                                 # print the best picks
    python tools/rotation_sim.py --salt 12345    # score one candidate
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _sampled_names() -> set[str]:
    out: set[str] = set()
    for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        out |= set(json.load(open(p)).keys())
    return out


def interleave(salt: int) -> list[str]:
    """Replay registry.load_all_query_modules' ordering for ``salt``."""
    from pulsar_cdc_experiment_spark import registry as R

    R.load_all_query_modules()
    by_family: dict[str, list[str]] = {}
    for name in R._REG_ORDER:
        fn = R.QUERIES[name]
        by_family.setdefault(
            getattr(fn, "__family__", "other"), []
        ).append(name)
    rot = len(R.QUERIES) + salt
    buckets = [
        b[rot % len(b):] + b[: rot % len(b)] for b in by_family.values()
    ]
    buckets = buckets[rot % len(buckets):] + buckets[: rot % len(buckets)]
    interleaved: list[str] = []
    i = 0
    while len(interleaved) < len(R.QUERIES):
        for b in buckets:
            if i < len(b):
                interleaved.append(b[i])
        i += 1
    return interleaved


def score(salt: int, sampled: set[str]) -> tuple[list[str], list[str]]:
    from pulsar_cdc_experiment_spark.registry import ORACLES

    order = interleave(salt)
    prefix = [n for n in order if n in ORACLES][:50]
    fresh = [n for n in prefix if n not in sampled]
    return prefix, fresh


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--salt", type=int, default=None)
    ap.add_argument("--scan", type=int, default=0)
    args = ap.parse_args()

    from pulsar_cdc_experiment_spark import registry as R

    R.load_all_query_modules()
    sampled = _sampled_names()
    never = [
        n for n in R._REG_ORDER if n in R.ORACLES and n not in sampled
    ]
    print(
        f"registry: {len(R.QUERIES)} queries, {len(R.ORACLES)} with "
        f"oracles; driver-sampled so far: {len(sampled)}; "
        f"never-sampled oracle-backed tail: {len(never)}"
    )

    # the committed salt must reproduce the LIVE ordering exactly —
    # this is the check that makes the changelog claims re-runnable
    live = list(R.QUERIES)
    committed = interleave(R._ROTATION_SALT)
    assert committed == live, (
        "simulated interleave does not match the live registry ordering"
    )
    prefix, fresh = score(R._ROTATION_SALT, sampled)
    print(
        f"committed salt {R._ROTATION_SALT}: {len(fresh)} never-sampled "
        f"names in the oracle-backed prefix-50:\n  {fresh}"
    )

    if args.salt is not None:
        prefix, fresh = score(args.salt, sampled)
        print(f"salt {args.salt}: {len(fresh)} fresh -> {fresh}")
    if args.scan:
        best: list[tuple[int, int]] = []
        for s in range(args.scan):
            _, fresh = score(s, sampled)
            best.append((len(fresh), s))
        best.sort(reverse=True)
        print("top 10 salts by fresh count:")
        for n, s in best[:10]:
            _, fresh = score(s, sampled)
            print(f"  salt {s}: {n} fresh -> {fresh}")


if __name__ == "__main__":
    main()
