"""Data model: the SRI resource row, target-table layouts, watermark table.

Mirrors the reference's document-in-row model (SURVEY §1; reference
``src/lib/client.js:310-346``, ``docker/postgres_initdb/initdb.sql:2-11``):
one wide row per resource with a fixed core (href/key/modified/jsondata) plus
an *optional-column matrix* (resourcetype / path / baseurl) that lets several
endpoints or APIs share one table. Logical uniqueness key =
(baseurl?, path?, href).

In Spark the table is a partitioned parquet dataset (partitioned by the
optional scoping columns that exist — so per-endpoint syncs prune to their own
partitions and a full-sync overwrite is a dynamic partition overwrite, never a
full-table rewrite).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# Core row columns, in canonical order (reference client.js:335-342).
RESOURCE_ROW_FIELDS = (
    ("href", T.StringType(), False),
    ("key", T.StringType(), True),
    ("modified", T.TimestampType(), True),  # NULL for expand=NONE rows (client.js:322-332)
    ("jsondata", T.StringType(), True),  # raw document string, NULL for expand=NONE
    ("resourcetype", T.StringType(), True),
)

OPTIONAL_SCOPING_COLUMNS = ("path", "baseurl")


@dataclass(frozen=True)
class TableLayout:
    """Which optional scoping columns a target table has (SURVEY §1.4).

    The reference introspects information_schema at runtime
    (client.js:361-410, 534-546); here a layout is an explicit value that the
    sink also *discovers* from an existing dataset's schema.
    """

    has_path: bool = True
    has_baseurl: bool = True
    has_resourcetype: bool = True
    name: str = "large"

    @property
    def key_columns(self) -> tuple[str, ...]:
        """Logical uniqueness key, widest first (README.md:255-259)."""
        cols: list[str] = []
        if self.has_baseurl:
            cols.append("baseurl")
        if self.has_path:
            cols.append("path")
        cols.append("href")
        return tuple(cols)

    @property
    def partition_columns(self) -> tuple[str, ...]:
        """Lake partitioning = the endpoint-scoping columns; keeps every sync
        inside its own partitions (partition pruning + cheap overwrite)."""
        return tuple(c for c in ("baseurl", "path") if getattr(self, f"has_{c}"))

    @property
    def columns(self) -> tuple[str, ...]:
        cols = [n for n, _, _ in RESOURCE_ROW_FIELDS]
        if not self.has_resourcetype:
            cols.remove("resourcetype")
        if self.has_path:
            cols.append("path")
        if self.has_baseurl:
            cols.append("baseurl")
        return tuple(cols)

    def schema(self) -> T.StructType:
        return resource_row_schema(self)


LAYOUT_LARGE = TableLayout(True, True, True, "large")
LAYOUT_MEDIUM = TableLayout(True, False, True, "medium")
LAYOUT_SMALL = TableLayout(False, False, True, "small")


def resource_row_schema(layout: TableLayout = LAYOUT_LARGE) -> T.StructType:
    fields = [
        T.StructField(n, t, nullable)
        for n, t, nullable in RESOURCE_ROW_FIELDS
        if n != "resourcetype" or layout.has_resourcetype
    ]
    if layout.has_path:
        fields.append(T.StructField("path", T.StringType(), True))
    if layout.has_baseurl:
        fields.append(T.StructField("baseurl", T.StringType(), True))
    return T.StructType(fields)


# Watermark / checkpoint table (reference sri2db_synctimes, client.js:420-463):
# per (tablename, baseurl, path, synctype) high-water mark in epoch millis.
SYNCTIMES_SCHEMA = T.StructType(
    [
        T.StructField("tablename", T.StringType(), False),
        T.StructField("baseurl", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("synctype", T.StringType(), False),  # FULL | DELTA | SAFEDELTA
        T.StructField("lastmodified", T.LongType(), True),
        T.StructField("syncstart", T.LongType(), True),
    ]
)
