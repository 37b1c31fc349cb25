"""pulsar_cdc_experiment_spark — a PySpark-native CDC + analytics engine.

A from-scratch re-expression of the capabilities of the reference CDC
pipeline (mannjg/pulsar-cdc-experiment: Postgres → Debezium → Pulsar →
Python enrichment function → Pulsar) as an idiomatic Apache Spark engine:

- CDC envelopes are typed ``StructType`` rows (schemas.py), not ad-hoc JSON.
- The per-message Python enrichment function becomes a single, shuffle-free
  columnar ``select`` (operators/enrichment.py) running in whole-stage codegen.
- The Pulsar topics become Structured Streaming sources/sinks (streaming/).
- On top of the CDC feed sits a full relational query surface
  (operators/relational.py and friends), verified against a DuckDB oracle,
  plus large-scale training-data-pipeline operators: dedup, similarity
  search, text analysis, multimodal plumbing (operators/dedup.py,
  similarity.py, text.py, multimodal.py).

Everything is DataFrame/SQL-first so Catalyst + AQE pick physical plans;
Python only runs inside Arrow-vectorized pandas UDFs where built-ins cannot
express the semantics.
"""

__version__ = "0.1.0"
