"""Driver-local literal DataFrames as pure-JVM LocalTableScans.

``SparkSession.createDataFrame(list_of_tuples)`` builds a PYTHON-RDD-backed
plan: the local rows are pickled into ``defaultParallelism`` RDD slices and
every downstream job evaluates them through Python worker round-trips. For
the tiny control frames this engine builds on the driver (a one-row
watermark upsert, a retraction id list, an empty-store placeholder) that
cost dominates the job — measured on local[32]: a one-row
``coalesce(1).write`` pays ~5-7 s because the single coalesced task drains
32 pickled slices through sequential Python worker handshakes.

Routing the same rows through a pandas DataFrame (the session enables
``spark.sql.execution.arrow.pyspark.enabled``) converts them ONCE on the
driver via Arrow into a JVM ``LocalTableScan`` — no Python at execution
time, measured ~10x faster on the same write. Empty frames take the
``range(0)`` projection form (Arrow's empty-frame path would silently fall
back to the pickled-row constructor).

Values are unchanged either way — these helpers only pick the physical
construction of the same local rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def empty_df(spark: SparkSession, schema: StructType) -> DataFrame:
    """Zero-row DataFrame with ``schema`` as a JVM-only plan (a projection
    over ``range(0)``), never a pickled-row RDD."""
    return spark.range(0).select(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def local_df(spark: SparkSession, rows: list, schema) -> DataFrame:
    """Small driver-local ``rows`` → DataFrame backed by a JVM
    LocalTableScan (via pandas/Arrow), falling back to :func:`empty_df`
    for zero rows. ``schema`` may be a StructType, a DDL string, or a
    column-name list (types inferred from the data, exactly as
    ``createDataFrame(rows, names)`` would)."""
    import pandas as pd  # noqa: PLC0415

    if isinstance(schema, (StructType, str)):
        st = (
            schema
            if isinstance(schema, StructType)
            else spark.createDataFrame([], schema).schema
        )
        if not rows:
            return empty_df(spark, st)
        pdf = pd.DataFrame(rows, columns=[f.name for f in st.fields])
        return spark.createDataFrame(pdf, st)
    # column-name list: infer types from the data like createDataFrame does
    names = list(schema)
    if not rows:
        return spark.createDataFrame([], StructType([]))  # degenerate; callers
        # with possibly-empty rows pass an explicit schema
    return spark.createDataFrame(pd.DataFrame(rows, columns=names))
