"""Structured Streaming: sources, sinks, stateful ops, CDC stream pipeline.

The engine's streaming stance (SURVEY.md §7): every operator is a pure
DataFrame→DataFrame function; streaming wires the same functions between
``readStream`` and ``writeStream``. Batch runs of the same plans are the
correctness oracle (Structured Streaming's prefix-consistency guarantee).

Delivery semantics vs the reference: the reference is at-least-once with
VOLATILE offsets (reference functions/README.md:23,
debezium-postgres-connector.yaml:31 — restart ⇒ re-snapshot). Checkpointed
Structured Streaming gives exactly-once to idempotent sinks — strictly
stronger (SURVEY.md §2 B1/B2).
"""
