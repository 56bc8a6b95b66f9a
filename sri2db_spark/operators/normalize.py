"""Record-level normalization (SURVEY §2.B) — built-in functions only.

Transforms raw SRI API page payloads into resource-table rows. The reference
does this record-at-a-time in Node (``src/lib/utils.js:54-66,149-169``,
``src/lib/client.js:310-346``); here each step is a columnar expression so the
whole pipeline stays inside whole-stage codegen.

Input convention: one DataFrame row per *API list entry*, with columns
``href: string`` and ``resource: string`` (the raw JSON document, NULL for
expand=NONE entries). The paged reader (sources.sri_api) produces exactly
this shape; normalization then parses only the envelope fields it needs via
``get_json_object`` (the full document is kept verbatim as jsondata — the
reference stores resources verbatim too, client.js:338).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model.schema import TableLayout


def normalize_api_page(df: DataFrame) -> DataFrame:
    """B1 — uniform (href, resource) rows from any SRI response shape.

    The reader already unwraps {results: [{href, $$expanded}]} | plain array |
    href-only array (utils.js:149-169) into (href, resource) pairs; this hook
    exists for pre-normalized DataFrames coming from other sources and fills
    href from the document when only the document is present.
    """
    return df.withColumn(
        "href",
        F.coalesce(F.col("href"), F.get_json_object("resource", "$.$$meta.permalink")),
    )


def repair_resources(df: DataFrame, ingest_ts=None) -> DataFrame:
    """B2 — fixResourceForStoring (utils.js:54-66), columnar.

    - ``modified`` := $$meta.modified, defaulted to the ingest timestamp when
      the document lacks one;
    - ``key`` := document key, derived from the permalink tail when absent.

    Adds columns ``key``/``modified``/``resourcetype`` next to the raw
    document. NULL-resource (expand=NONE) rows keep NULL modified/key-from-href.
    """
    from pyspark.sql import types as T  # noqa: PLC0415

    ingest = ingest_ts if ingest_ts is not None else F.current_timestamp()
    # ONE JSON parse per row: the former three independent get_json_object
    # calls each re-parsed the full document (the staging stage's dominant
    # CPU on a 2M-row sync); from_json with a partial envelope schema
    # extracts all three fields in a single pass. String-typed fields
    # return the identical values get_json_object produced (unescaped
    # string value; null when absent or unparsable — PERMISSIVE from_json
    # yields a null/empty struct there, so every downstream coalesce takes
    # the same branch).
    envelope = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField(
                "$$meta",
                T.StructType(
                    [
                        T.StructField("modified", T.StringType()),
                        T.StructField("type", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    env = F.from_json(F.col("resource"), envelope)
    return (
        df.withColumn("__env", env)
        .withColumn(
            "modified",
            F.when(
                F.col("resource").isNotNull(),
                F.coalesce(
                    F.to_timestamp(F.col("__env")["$$meta"]["modified"]), ingest
                ),
            ),
        )
        .withColumn(
            "key",
            F.coalesce(
                F.col("__env")["key"],
                F.element_at(F.split(F.col("href"), "/"), -1),
            ),
        )
        .withColumn("resourcetype", F.col("__env")["$$meta"]["type"])
        .drop("__env")
    )


def project_to_row(
    df: DataFrame,
    layout: TableLayout,
    baseurl: str | None = None,
    path: str | None = None,
) -> DataFrame:
    """B3 — project repaired resources to the target-table row shape
    (client.js:310-346): href, key, modified, jsondata, resourcetype?, and the
    configured scoping literals path?/baseurl?."""
    cols = [
        F.col("href"),
        F.col("key"),
        F.col("modified"),
        F.col("resource").alias("jsondata"),
    ]
    if layout.has_resourcetype:
        cols.append(F.col("resourcetype"))
    if layout.has_path:
        cols.append(F.lit(path).cast("string").alias("path"))
    if layout.has_baseurl:
        cols.append(F.lit(baseurl).cast("string").alias("baseurl"))
    return df.select(*cols)


def string_hash_java(col) -> F.Column:
    """B7 — the reference's ``hashCode`` (utils.js:31-42): the classic Java
    31-multiplier string hash with signed-int32 wrap, used there only for
    keying connection pools / staging-table names. Pure codegen fold:
    acc*31 + codepoint per char, re-wrapped to [-2³¹, 2³¹) each step
    (long arithmetic, so no ANSI overflow)."""
    c = F.col(col) if isinstance(col, str) else col
    wrap = lambda x: F.pmod(x + F.lit(2**31), F.lit(2**32)) - F.lit(2**31)  # noqa: E731
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: wrap(acc * 31 + F.ascii(ch)),
    ).cast("int")


def scrub_dollar_fields_deep(df: DataFrame, json_col: str = "jsondata") -> DataFrame:
    """B4 (full) — recursive removeDollarFields (utils.js:14-25): drop every
    ``$$``-prefixed key except ``$$meta`` at ANY depth, recursing into kept
    objects and arrays exactly like the reference.

    Dead code in the reference's sync path (imported, never called —
    client.js:20 vs :338), so this parity op is NOT on any hot path; a
    vectorized (Arrow-batched) pandas UDF is the honest implementation for
    arbitrary-depth JSON, which no codegen expression can express. The
    output document keeps the engine's canonical dump form (sorted keys,
    compact separators) so scrubbing is idempotent with staging."""
    import json  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    def _scrub(obj):
        if isinstance(obj, dict):
            return {
                k: _scrub(v)
                for k, v in obj.items()
                if not (k.startswith("$$") and k != "$$meta")
            }
        if isinstance(obj, list):
            return [_scrub(v) for v in obj]
        return obj

    def _scrub_series(s):
        return s.map(
            lambda v: v
            if v is None
            else json.dumps(_scrub(json.loads(v)), separators=(",", ":"), sort_keys=True)
        )

    # real (non-string) annotations: `from __future__ import annotations`
    # would otherwise hide the Series->Series signature from pandas_udf
    _scrub_series.__annotations__ = {"s": pd.Series, "return": pd.Series}
    scrub = pandas_udf(_scrub_series, "string")
    return df.withColumn(json_col, scrub(F.col(json_col)))


def scrub_dollar_fields(df: DataFrame, json_col: str = "jsondata") -> DataFrame:
    """B4 — removeDollarFields (utils.js:14-25): strip ``$$``-prefixed
    expansion keys except ``$$meta`` from the document.

    Dead code in the reference's sync path (imported, never called —
    client.js:20 vs :338); provided for parity. Top-level keys are handled
    with a JSON-string regex that avoids a Python UDF: keys like ``"$$x":``
    and their value up to the next top-level key. For nested scrubbing use the
    documented from_json/to_json round-trip with an explicit schema.
    """
    # Conservative top-level scrub: remove "$$name": <scalar or {...} or [...]>
    # pairs where name != "meta". Matches the reference's observable behavior
    # on flat expansion fields; deep nesting is out of scope (dead code).
    pattern = r'"\$\$(?!meta")[^"]*"\s*:\s*("([^"\\]|\\.)*"|\{[^{}]*\}|\[[^\[\]]*\]|[^,}\]]+)\s*,?'
    return df.withColumn(
        json_col,
        F.regexp_replace(F.regexp_replace(F.col(json_col), pattern, ""), r",\s*}", "}"),
    )
