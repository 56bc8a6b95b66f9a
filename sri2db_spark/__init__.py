"""sri2db_spark — a PySpark-native incremental-sync + analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``katholiek-onderwijs-vlaanderen/sri2db`` (a Node.js SRI-API →
Postgres/MSSQL incremental sync tool), re-expressed Spark-first:

- paged REST source with predicate/projection pushdown  → ``sources.sri_api``
- record normalization / repair                          → ``operators.normalize``
- window dedup + anti/semi-join merge semantics          → ``operators.merge``
- conservative watermark bookkeeping                     → ``operators.watermark``
- full / delta / safe-delta sync lifecycle               → ``sync.engine``
- multi-endpoint orchestration                           → ``sync.multi``
- event-triggered incremental refresh (streaming)        → ``streaming.listener``
- 100 TB-scale extensions (dedup, similarity, text, multimodal)
                                                         → ``functions.*``

Design rules (enforced throughout):
- DataFrame/SQL only; RDDs never. Catalyst owns physical planning.
- Built-in ``pyspark.sql.functions`` in every hot path; Pandas UDFs only where
  built-ins genuinely cannot express the semantics (multimodal decode).
- Every shuffle is deliberate: broadcast small dims, partition big merges by
  their join key, AQE on.
"""

__version__ = "0.1.0"
