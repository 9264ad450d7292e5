"""leftshove_spark — a PySpark-native incremental-snapshot (CDC) analytics
engine with the query semantics of the reference Go utility
``loicalleyne/leftshove`` (see SURVEY.md), rebuilt Spark-first.

Layering (SURVEY.md §7):

- :mod:`leftshove_spark.session`     — SparkSession factory, engine config
- :mod:`leftshove_spark.schema`      — source→engine type translation (§1.3, D9)
- :mod:`leftshove_spark.state`       — watermark/state table (S5, W5, W6, D8)
- :mod:`leftshove_spark.controller`  — adaptive window controller (W2, W3)
- :mod:`leftshove_spark.snapshot`    — capture-query builder F1–F6
- :mod:`leftshove_spark.views`       — current-state dedup view (J3, D5)
- :mod:`leftshove_spark.sinks`       — append / JSON-lines sinks (S2, S3)
- :mod:`leftshove_spark.engine`      — seed / create-sinks / run-cycle loop (§3)
- :mod:`leftshove_spark.statestore`  — manifest-committed fold store (K15–K19):
  atomic commits, retention/time travel, change feed, sync_state replicas,
  vacuum_orphans maintenance
- :mod:`leftshove_spark.streaming`   — Structured Streaming variant (W1–W5)
- :mod:`leftshove_spark.pipeline_runner` — declarative curation pipelines (P2/P3)
- :mod:`leftshove_spark.operators`   — relational surface (§2.2–2.8)
- :mod:`leftshove_spark.ext`         — dedup / similarity / text / multimodal
"""

__version__ = "0.1.0"
