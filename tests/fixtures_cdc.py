"""Synthetic Debezium envelope fixtures.

Shapes replayed from the reference's documented samples
(reference docs/setup-guide.md:66-90, docs/architecture.md:260-283); the
parquet `events` test table is a generic event stream, so CDC envelopes are
synthesized here per FIXTURES.md §2.
"""

from __future__ import annotations

import json


def source_block(lsn: int, tx_id: int, ts_ms: int, snapshot: str = "false", table: str = "customers"):
    return {
        "version": "1.9.7.Final",
        "connector": "postgresql",
        "name": "dbserver1",
        "ts_ms": ts_ms,
        "snapshot": snapshot,
        "db": "inventory",
        "schema": "public",
        "table": table,
        "txId": tx_id,
        "lsn": lsn,
    }


def row(id_: int, name: str, email: str, created_us: int = 1763741883901236):
    return {"id": id_, "name": name, "email": email, "created_at": created_us}


def envelope(op: str, before, after, lsn: int, tx_id: int, ts_ms: int, snapshot: str = "false", table: str = "customers"):
    return {
        "before": before,
        "after": after,
        "source": source_block(lsn, tx_id, ts_ms, snapshot, table),
        "op": op,
        "ts_ms": ts_ms,
    }


def sample_history() -> list[dict]:
    """A plausible multi-key history with strictly increasing LSNs."""
    t0 = 1637012345000
    return [
        # snapshot reads
        envelope("r", None, row(1, "Alice", "alice@example.com"), 100, 1, t0, "true"),
        envelope("r", None, row(2, "Bob", "bob@corp.io"), 101, 1, t0, "true"),
        # id=1: two updates
        envelope("u", row(1, "Alice", "alice@example.com"), row(1, "Alice A", "alice@example.com"), 200, 2, t0 + 1000),
        envelope("u", row(1, "Alice A", "alice@example.com"), row(1, "Alice B", "alice.b@example.com"), 300, 3, t0 + 2500),
        # id=3: create then delete (tombstone)
        envelope("c", None, row(3, "Carol", "carol@x.org"), 400, 4, t0 + 3000),
        envelope("d", row(3, "Carol", "carol@x.org"), None, 500, 5, t0 + 4000),
        # id=4: create with empty email (email-insights branch), odd ts (iso fraction branch)
        envelope("c", None, row(4, "Dave", ""), 600, 6, t0 + 4567),
        # id=5: email without '@'
        envelope("c", None, row(5, "Eve", "not-an-email"), 700, 7, t0 + 5000),
        # unknown op code (UNKNOWN branch)
        envelope("x", None, row(6, "Frank", "frank@y.io"), 800, 8, t0 + 6000),
    ]


def sample_json_lines() -> list[str]:
    return [json.dumps(e) for e in sample_history()]


# Genuinely unparseable per the reference: json.loads fails, or the parsed
# value is not a dict so message.get raises (cdc_enrichment_function.py:20-35,
# 104-107) → the ORIGINAL bytes pass through.
MALFORMED = [
    "not json at all {",
    '"just a string"',
    "[1, 2, 3]",
    "",
]

# VALID per the reference: JSON objects, even without an op field —
# message.get("op", "unknown") enriches them with code "unknown" / UNKNOWN.
OP_LESS = [
    '{"no_op_field": true}',
    '{"ts_ms": 1637012345000}',
]
