"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 plus the
100 TB-pipeline extensions; ``oracle_sql()`` gives the DuckDB mirror of each
— every registry query has a hash-matchable oracle (sketch operators are
checked via containment against their already-oracled exact counterparts).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sri2db_spark.plans.analytics import QUERIES
from sri2db_spark.plans.oracles import ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-style pricing summary
    (scan → filter → hash-agg with decimal-exact sums)."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
