"""Unit tests: normalization edge cases, watermark formula, page translation,
and the distributed offset-sharded reader."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sri2db_spark.operators.normalize import repair_resources, scrub_dollar_fields
from sri2db_spark.operators.watermark import (
    COLD_START_MILLIS,
    advance_watermark,
)
from sri2db_spark.sources.sri_api import (
    SriApiReader,
    set_expand_on_path,
    strip_query,
    translate_page,
)

from .fake_api import FakeSriApi


# ---- B6 watermark formula (client.js:1826-1839 verbatim) -----------------


def test_watermark_advance_uses_most_conservative():
    # last seen 10_000; sync took 1000ms → candidate1 = 10_000 − 1010 = 8990
    # prev mark 9000, syncs 2000ms apart → candidate2 = 9000 − 1010 + 1980 = 9970
    out = advance_watermark(10_000, 9_000, 98_000, 100_000, 101_000)
    assert out == 9970  # max of candidates


def test_watermark_advance_first_sync_no_previous():
    out = advance_watermark(10_000, None, None, 100_000, 101_000)
    assert out == 10_000 - 1010


def test_watermark_no_records_keeps_old_mark():
    assert advance_watermark(None, 9_000, 98_000, 100_000, 101_000) == 9_000
    assert advance_watermark(None, None, None, 100_000, 101_000) is None


def test_cold_start_is_1900():
    import datetime as dt

    d = dt.datetime.fromtimestamp(COLD_START_MILLIS / 1000, tz=dt.timezone.utc)
    assert d.year == 1900 and d.month == 1 and d.day == 1


# ---- B1 response translation (utils.js:149-169) ---------------------------


def test_translate_page_results_envelope():
    page = {
        "$$meta": {"next": "/a?offset=3"},
        "results": [
            {"href": "/a/1", "$$expanded": {"key": "1"}},
            {"href": "/a/2"},  # expand=NONE entry
        ],
    }
    rows = translate_page(page)
    assert rows[0][0] == "/a/1" and json.loads(rows[0][1]) == {"key": "1"}
    assert rows[1] == ("/a/2", None)


def test_translate_page_plain_and_href_arrays():
    rows = translate_page([{"$$meta": {"permalink": "/a/3"}, "key": "3"}])
    assert rows[0][0] == "/a/3"
    assert translate_page(["/a/4", "/a/5"]) == [("/a/4", None), ("/a/5", None)]
    assert translate_page({"results": []}) == []


def test_url_helpers():
    assert set_expand_on_path("/a", "NONE") == "/a?expand=NONE"
    assert set_expand_on_path("/a?x=1", "FULL") == "/a?x=1&expand=FULL"
    assert set_expand_on_path("/a?expand=FULL&x=1", "NONE") == "/a?expand=NONE&x=1"
    assert strip_query("/a?x=1") == "/a"


# ---- B2/B4 record repair + scrub -----------------------------------------


def test_repair_derives_key_and_defaults_modified(spark):
    df = spark.createDataFrame(
        [
            ("/a/77", json.dumps({"$$meta": {"permalink": "/a/77"}})),  # no key/modified
            ("/a/8", json.dumps({"$$meta": {"modified": "2020-01-01T00:00:00Z"}, "key": "8"})),
        ],
        "href string, resource string",
    )
    fixed_ts = F.to_timestamp(F.lit("2024-06-01 00:00:00"))
    out = {r["href"]: r for r in repair_resources(df, ingest_ts=fixed_ts).collect()}
    assert out["/a/77"]["key"] == "77"  # derived from permalink tail
    assert out["/a/77"]["modified"].year == 2024  # defaulted to ingest time
    assert out["/a/8"]["modified"].year == 2020


def test_scrub_dollar_fields(spark):
    doc = json.dumps(
        {"$$meta": {"permalink": "/a/1"}, "key": "1", "$$expanded_rel": {"x": 1}, "name": "n"}
    )
    df = spark.createDataFrame([(doc,)], "jsondata string")
    out = json.loads(scrub_dollar_fields(df).first()["jsondata"])
    assert "$$expanded_rel" not in out
    assert out["$$meta"] == {"permalink": "/a/1"}  # $$meta survives
    assert out["key"] == "1" and out["name"] == "n"


# ---- A2 scale path: offset-sharded distributed read -----------------------


def test_read_offset_sharded_covers_collection(spark):
    api = FakeSriApi(n=50, page_size=10)
    api.page_size = 10
    reader = SriApiReader(spark, "https://fake.api", fetch_json=api.fetch_json, limit=10)
    df = reader.read_offset_sharded("/a", total_count=50, shard_size=10)
    hrefs = sorted(r["href"] for r in df.collect())
    assert len(hrefs) == 50
    assert hrefs[0] == "/a/1"


def test_broken_next_links_offset_fallback(spark):
    api = FakeSriApi(n=10, page_size=3)
    api.broken_next_links = True  # server emits no $$meta.next
    reader = SriApiReader(
        spark, "https://fake.api", fetch_json=api.fetch_json, limit=3, next_links_broken=True
    )
    df = reader.read_collection("/a")
    assert df.count() == 10  # reader synthesizes offset pages (A2)


def test_versioned_history_scd2_semantics(spark):
    """Each version's valid_to equals the next version's valid_from; exactly
    one current row per key; singleton keys are immediately current."""
    from sri2db_spark.operators.merge import versioned_history

    df = spark.createDataFrame(
        [
            ("a", 1, 100), ("a", 2, 200), ("a", 3, 300),
            ("b", 4, 150),
        ],
        "key string, version int, ts long",
    )
    rows = {
        (r.key, r.version): r
        for r in versioned_history(df, ["key"], "ts", tiebreak=["version"]).collect()
    }
    assert rows[("a", 1)].valid_to == 200 and not rows[("a", 1)].is_current
    assert rows[("a", 2)].valid_to == 300
    assert rows[("a", 3)].valid_to is None and rows[("a", 3)].is_current
    assert rows[("b", 4)].is_current
    currents = [k for k, r in rows.items() if r.is_current]
    assert sorted(currents) == [("a", 3), ("b", 4)]


def test_string_hash_java_matches_reference_algorithm(spark):
    """B7 — expression fold == the reference's JS hashCode (utils.js:31-42)."""
    from pyspark.sql import functions as F

    from sri2db_spark.operators.normalize import string_hash_java

    def js_hash(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * 31 + ord(ch)) & 0xFFFFFFFF
        return h - 2**32 if h >= 2**31 else h

    samples = ["", "a", "abc", "/persons/123?expand=FULL", "x" * 50, "Hello World"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", string_hash_java(F.col("s")).alias("h")).collect()}
    for s in samples:
        assert got[s] == js_hash(s), s
    assert js_hash("abc") == 96354  # known Java hashCode fixture


def test_scrub_dollar_fields_deep_recursive(spark):
    """B4 full parity — $$-keys removed at every depth, $$meta kept (and
    itself recursed), arrays descended (utils.js:14-25)."""
    import json

    from sri2db_spark.operators.normalize import scrub_dollar_fields_deep

    doc = {
        "$$meta": {"permalink": "/a/1", "$$inner": 1, "nested": {"$$x": 2, "keep": 3}},
        "$$expanded": {"big": "drop me"},
        "name": "n",
        "children": [
            {"$$ref": "x", "key": "c1", "deeper": {"$$gone": True, "stay": [1, 2]}},
            "scalar",
        ],
    }
    df = spark.createDataFrame(
        [(json.dumps(doc),), (None,)], "jsondata string"
    )
    rows = scrub_dollar_fields_deep(df).collect()
    out = json.loads(rows[0]["jsondata"])
    assert "$$expanded" not in out
    assert out["$$meta"]["permalink"] == "/a/1"
    assert "$$inner" not in out["$$meta"]  # recursed INTO $$meta too
    assert out["$$meta"]["nested"] == {"keep": 3}
    assert out["children"][0] == {"key": "c1", "deeper": {"stay": [1, 2]}}
    assert out["children"][1] == "scalar"
    assert rows[1]["jsondata"] is None
