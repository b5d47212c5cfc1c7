"""rq_spark — a PySpark-native analytics engine with the capabilities of
dflemstr/rq (record query), rebuilt Spark-first.

Two layers (see SURVEY.md):

* **Faithful layer** (`rq_spark.formats`, `rq_spark.cli`): rq's
  format-transcoding surface — 9 sources, 8 sinks, the coercion/error
  semantics of `/root/reference/src/value/*` — expressed as Spark
  readers/writers plus Arrow-batched Python codecs.
* **Extension layer** (`rq_spark.queries`, `rq_spark.operators`): the
  relational/analytics operators a "record query" engine implies —
  projections, joins, aggregations, windows, dedup, similarity search,
  text analysis — all stock DataFrame/SQL so Catalyst optimizes them.

Design stance: DataFrame-first, shuffle-aware, 100 TB design target.
No code is ported from the reference; behavior parity only.
"""

__version__ = "0.1.0"
