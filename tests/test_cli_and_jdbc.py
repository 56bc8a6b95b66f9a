"""CLI end-to-end (config → sync → report) and JDBC merge SQL generation."""

from __future__ import annotations

import json
from unittest import mock

from sri2db_spark import cli
from sri2db_spark.model.schema import LAYOUT_LARGE, LAYOUT_SMALL
from sri2db_spark.sinks.jdbc import (
    generate_delta_sync_sql,
    generate_full_sync_sql,
)

from .fake_api import FakeSriApi


def _patched_reader(api):
    """CLI builds real readers; patch the transport to the fake API."""
    import sri2db_spark.cli as climod

    orig = climod.SriApiReader

    def factory(spark, base_url, **kw):
        kw.pop("fetch_json", None)
        return orig(spark, base_url, fetch_json=api.fetch_json, **kw)

    return mock.patch.object(climod, "SriApiReader", factory)


def test_cli_single_full_sync(spark, tmp_path, capsys):
    api = FakeSriApi(n=7)
    cfg = {
        "api": {"baseUrl": "https://fake.api", "path": "/a", "limit": 3},
        "db": {
            "location": str(tmp_path / "table"),
            "synctimes": str(tmp_path / "wm"),
            "layout": "large",
        },
        "synctype": "fullSync",
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    with _patched_reader(api):
        rc = cli.main([str(cfg_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "FULL: 7 resources" in out


def test_cli_multi_with_overwrites(spark, tmp_path, capsys):
    api_a, api_b = FakeSriApi(path="/a", n=4), FakeSriApi(path="/b", n=2)

    apis = {"/a": api_a, "/b": api_b}

    import sri2db_spark.cli as climod

    orig = climod.SriApiReader

    class Factory:
        def __call__(self, spark, base_url, **kw):
            reader = orig(spark, base_url, **kw)
            # dispatch per-path at fetch time: both fakes share URL space
            reader.fetch_json = lambda url: apis[
                "/a" if "/a" in url.split("?")[0] else "/b"
            ].fetch_json(url)
            return reader

    cfg = {
        "baseConfig": {
            "api": {"baseUrl": "https://fake.api", "path": "/a", "limit": 3},
            "db": {"location": str(tmp_path / "table"), "synctimes": str(tmp_path / "wm")},
            "synctype": "fullSync",
        },
        "overwrites": [{}, {"api": {"path": "/b"}}],
        "concurrency": 2,
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    with mock.patch.object(climod, "SriApiReader", Factory()):
        rc = cli.main([str(cfg_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "https://fake.api/a: FULL ok, 4 resources" in out
    assert "https://fake.api/b: FULL ok, 2 resources" in out


def test_cli_dry_run_flag(spark, tmp_path, capsys):
    api = FakeSriApi(n=3)
    cfg = {
        "api": {"baseUrl": "https://fake.api", "path": "/a"},
        "db": {"location": str(tmp_path / "table")},
        "synctype": "fullSync",
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    with _patched_reader(api):
        rc = cli.main([str(cfg_path), "--dry-run"])
    assert rc == 0
    assert "(dry run)" in capsys.readouterr().out
    import os

    assert not os.path.exists(tmp_path / "table") or not any(
        os.scandir(tmp_path / "table")
    )


def test_cli_state_maintenance_commands(spark, tmp_path, capsys):
    """state-compact / state-retract / output-compact drive the library
    maintenance ops, including the manifest-committer route."""
    from sri2db_spark.functions import pipeline as P
    from sri2db_spark.functions.statestore import read_store
    from sri2db_spark.sinks.committer import ManifestCommitter

    mc = ManifestCommitter()
    state = str(tmp_path / "state")
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today", "en"),
         (2, "completely different text about columnar storage engines", "en")],
        "doc_id long, text string, lang string",
    )
    P.init_curation_state(docs, state, committer=mc)
    rc = cli.main(["state-compact", "--state", state, "--committer", "manifest"])
    assert rc == 0
    assert "state-compact" in capsys.readouterr().out
    rc = cli.main([
        "state-retract", "--state", state, "--ids", "2", "--committer", "manifest"
    ])
    assert rc == 0
    assert "1 ids removed" in capsys.readouterr().out
    assert sorted(
        r.id for r in read_store(spark, f"{state}/corpus", committer=mc).collect()
    ) == [1]
    # output-compact over a batch_id-addressed output dir
    out = str(tmp_path / "out")
    for b in range(3):
        spark.createDataFrame(
            [(b, f"d{b}")], "doc_id long, text string"
        ).write.parquet(f"{out}/batch_id={b}")
    rc = cli.main(["output-compact", "--dir", out, "--keys", "doc_id"])
    assert rc == 0
    assert "output-compact" in capsys.readouterr().out
    assert spark.read.parquet(out).count() == 3
    # output-retract: RTBF on the published output
    rc = cli.main(["output-retract", "--dir", out, "--ids", "1"])
    assert rc == 0
    assert "output-retract ok: 1 rows removed" in capsys.readouterr().out
    assert sorted(
        r.doc_id for r in spark.read.parquet(out).collect()
    ) == [0, 2]


# ---- JDBC merge SQL generation ------------------------------------------


def test_full_sync_sql_delete_all_mode():
    stmts = generate_full_sync_sql(
        "resources", "stg", LAYOUT_LARGE,
        scope={"baseurl": "https://x", "path": "/a"},
        prefer_updates_over_inserts=False,
    )
    assert len(stmts) == 2
    assert stmts[0].startswith("DELETE FROM resources")
    assert "IS NOT DISTINCT FROM 'https://x'" in stmts[0]
    assert "ROW_NUMBER() OVER (PARTITION BY baseurl, path, href" in stmts[1]


def test_full_sync_sql_merge_mode():
    stmts = generate_full_sync_sql(
        "resources", "stg", LAYOUT_LARGE,
        scope={"baseurl": None, "path": "/a"},
        prefer_updates_over_inserts=True,
    )
    assert len(stmts) == 3
    assert "NOT EXISTS" in stmts[0]  # C2 anti-join delete
    # C5 null-aware change detection, reference shape (client.js:1064)
    assert "w.jsondata <> t.jsondata OR (w.jsondata IS NULL" in stmts[1]
    assert "NOT EXISTS" in stmts[2]  # C6 insert-if-absent
    assert "IS NOT DISTINCT FROM NULL" in stmts[0]  # null scoping


def test_delta_sync_sql_pg_vs_mssql():
    pg = generate_delta_sync_sql("r", "stg_u", "stg_d", LAYOUT_SMALL, "postgresql")
    ms = generate_delta_sync_sql("r", "stg_u", "stg_d", LAYOUT_SMALL, "mssql")
    assert pg[0].startswith("DELETE FROM r w USING stg_d t")  # client.js:1033
    assert ms[0].startswith("DELETE w FROM r w INNER JOIN stg_d t")  # client.js:899
    assert "w.jsondata IS NULL AND t.jsondata IS NOT NULL" in ms[1]  # client.js:932
    # small layout: key is href only
    assert "s.href = w.href" in pg[2]
    assert "baseurl" not in pg[2]


def test_layout_from_columns_matrix():
    """A9 — layout discovery from a column catalog (client.js:361-410)."""
    from sri2db_spark.sinks.jdbc import layout_from_columns

    large = layout_from_columns(
        ["href", "key", "modified", "jsondata", "resourcetype", "path", "baseurl"]
    )
    assert (large.has_baseurl, large.has_path, large.has_resourcetype) == (True, True, True)
    assert large.key_columns == ("baseurl", "path", "href")
    small = layout_from_columns(["HREF", "KEY", "MODIFIED", "JSONDATA"])  # case-blind
    assert (small.has_baseurl, small.has_path, small.has_resourcetype) == (False, False, False)
    assert small.key_columns == ("href",)
    import pytest

    with pytest.raises(ValueError, match="jsondata"):
        layout_from_columns(["href", "key", "modified"])


def test_catalog_probe_query_dialects():
    from sri2db_spark.sinks.jdbc import catalog_probe_query

    pg = catalog_probe_query("myschema.resources", "postgresql")
    assert "information_schema.columns" in pg
    assert "table_name = 'resources'" in pg and "table_schema = 'myschema'" in pg
    ms = catalog_probe_query("resources", "mssql")
    assert "sys.columns" in ms and "o.name = 'resources'" in ms


def test_discover_layout_jdbc_via_injected_resultset(spark):
    """discover_layout_jdbc maps the probe resultset to a TableLayout; the
    JDBC transport is injected (no DB in the sandbox)."""
    from unittest import mock

    from sri2db_spark.sinks import jdbc as J

    probe = spark.createDataFrame(
        [("href",), ("key",), ("modified",), ("jsondata",), ("path",)],
        "column_name string",
    )
    reader = mock.MagicMock()
    reader.jdbc.return_value = probe
    with mock.patch.object(type(spark), "read", mock.PropertyMock(return_value=reader)):
        layout = J.discover_layout_jdbc(spark, "jdbc:postgresql://x/db", "resources", {})
    assert (layout.has_baseurl, layout.has_path, layout.has_resourcetype) == (
        False, True, False,
    )
    assert reader.jdbc.call_args[0][1].startswith("(SELECT column_name FROM information_schema")


def test_cli_jdbc_target_full_sync(spark, tmp_path, capsys):
    """A jdbcUrl config routes the CLI to the live-DB engine: full sync into
    embedded Derby via staging + one-transaction merge."""
    api = FakeSriApi(n=6)
    url = "jdbc:derby:memory:clidb;create=true"
    jvm = spark._sc._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    cols = ", ".join(
        f'"{c}" {t}'
        for c, t in [
            ("href", "VARCHAR(200)"), ("key", "VARCHAR(64)"),
            ("modified", "TIMESTAMP"), ("jsondata", "VARCHAR(4000)"),
            ("resourcetype", "VARCHAR(32)"), ("path", "VARCHAR(200)"),
            ("baseurl", "VARCHAR(200)"),
        ]
    )
    conn.createStatement().executeUpdate(f"CREATE TABLE resources ({cols})")
    conn.close()
    cfg = {
        "api": {"baseUrl": "https://fake.api", "path": "/a", "limit": 3},
        "db": {
            "jdbcUrl": url,
            "table": "resources",
            "dialect": "ansi",
            "synctimes": str(tmp_path / "wm"),
            "layout": "large",
            "stagingColumnTypes": (
                "href VARCHAR(200), key VARCHAR(64), modified TIMESTAMP, "
                "jsondata VARCHAR(4000), resourcetype VARCHAR(32), "
                "path VARCHAR(200), baseurl VARCHAR(200)"
            ),
        },
        "synctype": "fullSync",
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    with _patched_reader(api):
        rc = cli.main([str(cfg_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "FULL: 6 resources" in out
    back = spark.read.jdbc(url, "resources", properties={})
    assert back.count() == 6


def test_safe_delta_sql_dialects():
    from sri2db_spark.sinks.jdbc import generate_safe_delta_sql

    scope = {"baseurl": "https://x", "path": "/a"}
    pg = generate_safe_delta_sql("r", "stg_u", "stg_m", LAYOUT_LARGE, scope, "postgresql")
    ansi = generate_safe_delta_sql("r", "stg_u", "stg_m", LAYOUT_LARGE, scope, "ansi")
    # pg: C5 update + C6 insert + C7 scoped set-difference delete
    assert len(pg) == 3
    # C5 null-aware change detection, reference shape (client.js:1064)
    assert "w.jsondata <> t.jsondata OR (w.jsondata IS NULL" in pg[0]
    assert pg[2].startswith("DELETE FROM r w WHERE")
    assert "NOT EXISTS" in pg[2] and "stg_m" in pg[2]
    assert "w.baseurl IS NOT DISTINCT FROM 'https://x'" in pg[2]
    # ansi: one MERGE upsert + the same delete with quoted identifiers
    assert len(ansi) == 2
    assert ansi[0].startswith("MERGE INTO r w USING stg_u t")
    assert 'w."baseurl" = \'https://x\'' in ansi[1]


def test_multi_orchestrates_mixed_lake_and_jdbc_targets(spark, tmp_path):
    """One Sri2DbMulti fleet can mix lake and live-DB endpoints — both expose
    configured_sync, settled-results semantics unchanged."""
    from sri2db_spark.model.schema import LAYOUT_LARGE as L
    from sri2db_spark.sinks.jdbc import JdbcResourceSink
    from sri2db_spark.sinks.lake import LakeTable
    from sri2db_spark.sources.sri_api import SriApiReader
    from sri2db_spark.sync.engine import Sri2DbSync
    from sri2db_spark.sync.jdbc_engine import Sri2DbJdbcSync
    from sri2db_spark.sync.multi import Sri2DbMulti

    api1 = FakeSriApi(n=4)
    api2 = FakeSriApi(n=5)
    lake = Sri2DbSync(
        reader=SriApiReader(spark, "https://a", fetch_json=api1.fetch_json, limit=3),
        table=LakeTable(spark, str(tmp_path / "t"), L),
        path="/a", baseurl="https://a", layout=L,
    )
    url = "jdbc:derby:memory:multidb;create=true"
    sink = JdbcResourceSink(spark, url, "resources", L, {}, dialect="ansi")
    conn = sink._connection()
    cols = ", ".join(
        f'"{c}" {t}'
        for c, t in [
            ("href", "VARCHAR(200)"), ("key", "VARCHAR(64)"),
            ("modified", "TIMESTAMP"), ("jsondata", "VARCHAR(4000)"),
            ("resourcetype", "VARCHAR(32)"), ("path", "VARCHAR(200)"),
            ("baseurl", "VARCHAR(200)"),
        ]
    )
    conn.createStatement().executeUpdate(f"CREATE TABLE resources ({cols})")
    conn.close()
    db = Sri2DbJdbcSync(
        reader=SriApiReader(spark, "https://b", fetch_json=api2.fetch_json, limit=3),
        sink=sink, path="/a", baseurl="https://b", layout=L,
        staging_column_types=(
            "href VARCHAR(200), key VARCHAR(64), modified TIMESTAMP, "
            "jsondata VARCHAR(4000), resourcetype VARCHAR(32), "
            "path VARCHAR(200), baseurl VARCHAR(200)"
        ),
    )
    settled = Sri2DbMulti([lake, db], concurrency=2).configured_sync("fullSync")
    assert all(s.is_fulfilled for s in settled)
    assert settled[0].value.rows_after == 4
    assert settled[1].value.rows_after == 5


def test_cli_snapshot_pin_list_read_unpin(spark, tmp_path, capsys):
    """Config-selected manifest committer + the snapshot subcommands:
    sync → pin → mutate+sync → list shows history/pin → read the pinned
    snapshot back out as parquet → unpin."""
    api = FakeSriApi(n=5)
    cfg = {
        "api": {"baseUrl": "https://fake.api", "path": "/a", "limit": 3},
        "db": {
            "location": str(tmp_path / "table"),
            "synctimes": str(tmp_path / "wm"),
            "layout": "large",
            "committer": "manifest",
        },
        "synctype": "fullSync",
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    with _patched_reader(api):
        assert cli.main([str(cfg_path)]) == 0
    assert cli.main(["snapshot-pin", str(cfg_path), "--name", "run1"]) == 0
    version = capsys.readouterr().out.strip().split()[-1]
    assert version.startswith("v_")
    api.delete(2, modified="2032-01-01T00:00:00Z")
    with _patched_reader(api):
        assert cli.main([str(cfg_path)]) == 0  # full sync: now 4 rows
    assert cli.main(["snapshot-list", str(cfg_path)]) == 0
    listing = capsys.readouterr().out
    assert version in listing and "pin=run1" in listing
    out = str(tmp_path / "snap_out")
    rc = cli.main(
        ["snapshot-read", str(cfg_path), "--version", version, "--out", out]
    )
    assert rc == 0 and "5 rows" in capsys.readouterr().out
    snap = spark.read.parquet(out)
    assert snap.count() == 5  # the pre-delete corpus
    assert cli.main(["snapshot-unpin", str(cfg_path), "--name", "run1"]) == 0


def test_cli_table_cut_pin_and_read(spark, tmp_path, capsys):
    """--all pins the whole-table cut; snapshot-read --name reassembles it
    after the table has moved on."""
    api = FakeSriApi(n=4)
    cfg = {
        "api": {"baseUrl": "https://fake.api", "path": "/a", "limit": 3},
        "db": {
            "location": str(tmp_path / "table"),
            "synctimes": str(tmp_path / "wm"),
            "layout": "large",
            "committer": "manifest",
        },
        "synctype": "fullSync",
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    with _patched_reader(api):
        assert cli.main([str(cfg_path)]) == 0
    assert cli.main(
        ["snapshot-pin", str(cfg_path), "--name", "cut", "--all"]
    ) == 0
    assert "pinned cut @" in capsys.readouterr().out
    api.delete(1, modified="2033-01-01T00:00:00Z")
    with _patched_reader(api):
        assert cli.main([str(cfg_path)]) == 0  # now 3 rows
    out = str(tmp_path / "cut_out")
    rc = cli.main(
        ["snapshot-read", str(cfg_path), "--name", "cut", "--out", out]
    )
    assert rc == 0
    assert spark.read.parquet(out).count() == 4  # the pinned-time table
    assert cli.main(
        ["snapshot-unpin", str(cfg_path), "--name", "cut", "--all"]
    ) == 0


def test_cli_index_build_upsert_query_roundtrip(spark, tmp_path, capsys):
    """index-build / index-upsert / index-query subcommands drive the saved
    IVF index end-to-end; the queried neighbors include upserted vectors."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base_p = str(tmp_path / "base.parquet")
    batch_p = str(tmp_path / "batch.parquet")
    q_p = str(tmp_path / "q.parquet")
    emb.filter(F.col("vec_id") % 5 != 0).write.parquet(base_p)
    emb.filter(F.col("vec_id") % 5 == 0).write.parquet(batch_p)
    emb.filter(F.col("vec_id") < 4).write.parquet(q_p)
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "res")

    rc = cli.main(["index-build", "--vectors", base_p, "--out", idx, "--nlist", "8"])
    assert rc == 0
    rc = cli.main(["index-upsert", "--vectors", batch_p, "--index", idx])
    assert rc == 0
    rc = cli.main([
        "index-query", "--index", idx, "--queries", q_p, "--out", out,
        "--k", "3", "--nprobe", "8",
    ])
    assert rc == 0
    res = spark.read.parquet(out)
    assert res.count() == 12  # 4 queries x top-3
    # with every cell probed, results == brute force over base+batch
    import sri2db_spark.functions.similarity as S

    # ivf_query_index ranks by cosine; exhaustive probing = exact top-k
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(emb, emb.filter(F.col("vec_id") < 4), k=3).collect()
    }
    got = {(r.query_id, r.neighbor_id) for r in res.collect()}
    assert got == exact
    text = capsys.readouterr().out
    assert "index-build ok" in text and "index-query ok: 12" in text

    # index-delete: the RTBF path — deleted ids vanish from later queries
    victims = [r.vec_id for r in res.select("neighbor_id")
               .withColumnRenamed("neighbor_id", "vec_id").limit(2).collect()]
    rc = cli.main([
        "index-delete", "--index", idx,
        "--ids", ",".join(str(v) for v in victims),
    ])
    assert rc == 0
    assert f"index-delete ok: {len(set(victims))} vectors" in capsys.readouterr().out
    out2 = str(tmp_path / "res2")
    rc = cli.main([
        "index-query", "--index", idx, "--queries", q_p, "--out", out2,
        "--k", "3", "--nprobe", "8",
    ])
    assert rc == 0
    got2 = {r.neighbor_id for r in spark.read.parquet(out2).collect()}
    assert not got2 & set(victims)


def test_fetch_json_sends_auth_and_headers(spark):
    """make_fetch_json: Basic auth + extra headers reach the server; retry
    config honored (a first-request failure is retried)."""
    import base64
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from sri2db_spark.sources.sri_api import make_fetch_json

    seen = {"auth": None, "x": None, "calls": 0}

    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            seen["calls"] += 1
            if seen["calls"] == 1:  # force one retry
                self.send_response(500)
                self.end_headers()
                return
            seen["auth"] = self.headers.get("Authorization")
            seen["x"] = self.headers.get("X-Extra")
            body = _json.dumps({"results": []}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    fetch = make_fetch_json(
        username="alice", password="s3cret", headers={"X-Extra": "yes"},
        retries=2, initial_wait=0.05,
    )
    out = fetch(f"http://127.0.0.1:{srv.server_port}/things")
    srv.shutdown()
    assert out == {"results": []}
    assert seen["calls"] == 2  # retried once
    expect = "Basic " + base64.b64encode(b"alice:s3cret").decode()
    assert seen["auth"] == expect
    assert seen["x"] == "yes"


def test_cli_synctype_none_is_noop(spark, tmp_path, capsys):
    api = FakeSriApi(n=3)
    cfg = {
        "api": {"baseUrl": "https://fake.api", "path": "/a", "limit": 3},
        "db": {"location": str(tmp_path / "t"), "synctimes": str(tmp_path / "w"),
               "layout": "large"},
    }
    cfg_path = tmp_path / "cfg_none.json"
    cfg_path.write_text(json.dumps(cfg))
    with _patched_reader(api):
        rc = cli.main([str(cfg_path), "--synctype", "none"])
    assert rc == 0
    assert "nothing to do" in capsys.readouterr().out
    import os

    assert not os.path.exists(str(tmp_path / "t"))  # no sync ran


def test_cli_state_compact_incremental_needs_manifest(capsys):
    """--incremental carries the base by reference, which the rename
    committer cannot publish — the CLI must reject the combination as a
    usage error (argparse exit 2), not a raw ValueError traceback."""
    import pytest as _pytest

    with _pytest.raises(SystemExit) as exc:
        cli.state_main(["state-compact", "--state", "/nowhere", "--incremental"])
    assert exc.value.code == 2
    assert "manifest" in capsys.readouterr().err


def test_cli_config_wires_stage_like_target(spark, tmp_path):
    """db.stageLikeTarget routes through build_sync to the sink — the
    config escape hatch for jsonb targets (the failure like-target staging
    exists to fix)."""
    cfg = {
        "api": {"baseUrl": "https://fake.api", "path": "/a"},
        "db": {
            "jdbcUrl": "jdbc:derby:memory:neverconnected",
            "table": "resources",
            "dialect": "postgresql",
            "synctimes": str(tmp_path / "wm"),
            "stageLikeTarget": True,
        },
    }
    sync = cli.build_sync(spark, cfg)
    assert sync.sink.stage_like_target is True
    # and the pg connection defaults to server-side string casts in this
    # mode (stringtype=unspecified, node-pg-style untyped binds)
    assert sync.sink._props().get("stringtype") == "unspecified"
    # default stays off
    cfg["db"].pop("stageLikeTarget")
    assert cli.build_sync(spark, cfg).sink.stage_like_target is False
