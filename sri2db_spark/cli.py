"""CLI entry point — the ``bin/sri2db.js`` equivalent (SURVEY §3.4).

Usage:
    python -m sri2db_spark.cli CONFIG.json [--synctype fullSync|deltaSync|
        safeDeltaSync] [--listen] [--dry-run]

Config shape (JSON; mirrors the reference's config module, README.md:28-110):

    single:  {"api": {"baseUrl": ..., "path": ..., "limit": 500},
              "db": {"location": "/data/resources", "layout": "large",
                     "synctimes": "/data/synctimes", "table": "resources"},
              "synctype": "deltaSync", "dryRun": false}
    jdbc:    same, but "db" carries {"jdbcUrl": "jdbc:...", "table": ...,
              "dialect": "postgresql|mssql|ansi", "stagingTable": ...,
              "stagingColumnTypes": ..., "stageLikeTarget": true} — syncs
              into a live database via
              staging + one-transaction server-side merge instead of the
              parquet lake
    multi:   {"baseConfig": {...}, "overwrites": [{...RFC-7386 patches...}],
              "concurrency": 1}

Exit code 0 when every endpoint sync fulfilled, 1 otherwise (reference
exits -1 on failure, bin/sri2db.js:81,101).
"""

from __future__ import annotations

import argparse
import json
import sys

from .model.schema import LAYOUT_LARGE, LAYOUT_MEDIUM, LAYOUT_SMALL, TableLayout
from .operators.watermark import WatermarkStore
from .session import get_spark
from .sinks.lake import LakeTable
from .sources.sri_api import SriApiReader
from .streaming.listener import BroadcastListener
from .sync.engine import Sri2DbSync
from .sync.multi import Sri2DbMulti, merge_patch

LAYOUTS: dict[str, TableLayout] = {
    "large": LAYOUT_LARGE,
    "medium": LAYOUT_MEDIUM,
    "small": LAYOUT_SMALL,
}


def _committer_for(db: dict):
    """``"committer": "manifest"`` in the db config selects the
    object-store-safe protocol (versioned dirs + pointer); default stays
    the local rename swap."""
    name = db.get("committer", "rename")
    if name == "manifest":
        from .sinks.committer import ManifestCommitter  # noqa: PLC0415

        return ManifestCommitter(keep_versions=int(db.get("keepVersions", 1)))
    if name != "rename":
        raise ValueError(f"unknown committer {name!r} (rename|manifest)")
    from .sinks.committer import RenameCommitter  # noqa: PLC0415

    return RenameCommitter()


def build_sync(spark, cfg: dict, dry_run: bool = False):
    api = cfg.get("api", {})
    db = cfg.get("db", {})
    layout = LAYOUTS[db.get("layout", "large")]
    fetch = None
    if any(k in api for k in ("username", "headers", "timeout", "retry")):
        from .sources.sri_api import make_fetch_json  # noqa: PLC0415

        retry = api.get("retry", {})
        fetch = make_fetch_json(
            username=api.get("username"),
            password=api.get("password"),
            headers=api.get("headers"),
            timeout=float(api.get("timeout", 60_000)) / 1000.0,
            retries=int(retry.get("retries", 3)),
            initial_wait=float(retry.get("initialWait", 500)) / 1000.0,
            factor=float(retry.get("factor", 2.0)),
        )
    reader = SriApiReader(
        spark,
        api["baseUrl"],
        fetch_json=fetch,
        limit=int(api.get("limit", 500)),
        next_links_broken=bool(api.get("nextLinksBroken", False)),
    )
    wm = (
        WatermarkStore(spark, db["synctimes"], committer=_committer_for(db))
        if db.get("synctimes")
        else None
    )
    if db.get("jdbcUrl"):
        from .sinks.jdbc import JdbcResourceSink  # noqa: PLC0415
        from .sync.jdbc_engine import Sri2DbJdbcSync  # noqa: PLC0415

        sink = JdbcResourceSink(
            spark=spark,
            url=db["jdbcUrl"],
            target_table=db.get("table", "resources"),
            layout=layout,
            properties=db.get("properties", {}),
            dialect=db.get("dialect", "postgresql"),
            stage_like_target=bool(db.get("stageLikeTarget", False)),
        )
        return Sri2DbJdbcSync(
            reader=reader,
            sink=sink,
            path=api["path"],
            baseurl=api["baseUrl"] if layout.has_baseurl else None,
            layout=layout,
            watermarks=wm,
            tablename=db.get("table", "resources"),
            staging_table=db.get("stagingTable"),
            staging_column_types=db.get("stagingColumnTypes"),
            prefer_updates_over_inserts=bool(
                cfg.get("preferUpdatesOverInserts", True)
            ),
            deleted_not_implemented=bool(api.get("deletedNotImplemented", False)),
            dry_run=dry_run or bool(cfg.get("dryRun", False)),
        )
    table = LakeTable(spark, db["location"], layout, committer=_committer_for(db))
    return Sri2DbSync(
        reader=reader,
        table=table,
        path=api["path"],
        baseurl=api["baseUrl"] if layout.has_baseurl else None,
        layout=layout,
        watermarks=wm,
        tablename=db.get("table", "resources"),
        prefer_updates_over_inserts=bool(cfg.get("preferUpdatesOverInserts", False)),
        deleted_not_implemented=bool(api.get("deletedNotImplemented", False)),
        dry_run=dry_run or bool(cfg.get("dryRun", False)),
    )


def index_main(argv: list[str]) -> int:
    """ANN index maintenance subcommands (the 100 TB-extension surface):

    index-build  --vectors P --out DIR [--kind ivf|ivfpq] [--nlist N]
                 [--m M] [--ksub K] [--id-col c] [--vec-col c]
    index-upsert --vectors P --index DIR [--id-col c] [--vec-col c]
    index-delete --index DIR --ids ID[,ID…] [--id-type long|string]
    index-query  --index DIR --queries P --out DIR [--k N] [--nprobe N]
                 [--kind ivf|ivfpq] [--id-col c] [--vec-col c]
    """
    from .functions import similarity as S  # noqa: PLC0415

    p = argparse.ArgumentParser(prog="sri2db_spark " + argv[0])
    p.add_argument("--master", default=None)
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    cmd = argv[0]
    if cmd == "index-build":
        p.add_argument("--vectors", required=True)
        p.add_argument("--out", required=True)
        p.add_argument("--kind", choices=("ivf", "ivfpq"), default="ivf")
        p.add_argument("--nlist", type=int, default=16)
        p.add_argument("--m", type=int, default=4)
        p.add_argument("--ksub", type=int, default=16)
    elif cmd == "index-upsert":
        p.add_argument("--vectors", required=True)
        p.add_argument("--index", required=True)
    elif cmd == "index-delete":
        p.add_argument("--index", required=True)
        p.add_argument("--ids", required=True, help="comma-separated vector ids")
        p.add_argument("--id-type", default="long", choices=["long", "string"])
    else:
        p.add_argument("--index", required=True)
        p.add_argument("--queries", required=True)
        p.add_argument("--out", required=True)
        p.add_argument("--kind", choices=("ivf", "ivfpq"), default="ivf")
        p.add_argument("--k", type=int, default=5)
        p.add_argument("--nprobe", type=int, default=4)
    args = p.parse_args(argv[1:])
    spark = get_spark(app_name="sri2db_spark_index", master=args.master)
    if cmd == "index-build":
        vecs = spark.read.parquet(args.vectors)
        if args.kind == "ivfpq":
            S.build_ivfpq_index(
                vecs, args.out, args.id_col, args.vec_col,
                nlist=args.nlist, m=args.m, ksub=args.ksub,
            )
        else:
            S.build_ivf_index(vecs, args.out, args.id_col, args.vec_col, nlist=args.nlist)
        print(f"index-build ok: kind={args.kind} out={args.out}")
    elif cmd == "index-upsert":
        vecs = spark.read.parquet(args.vectors)
        # route by the index's actual on-disk layout, not a user flag: an
        # IVF-style append into an IVF-PQ cells directory would corrupt
        # partition discovery for every later query
        kind = S.saved_index_kind(spark, args.index)
        if kind == "ivfpq":
            S.ivfpq_index_upsert(spark, args.index, vecs, args.id_col, args.vec_col)
        else:
            S.ivf_index_upsert(spark, args.index, vecs, args.id_col, args.vec_col)
        print(f"index-upsert ok: kind={kind} index={args.index}")
    elif cmd == "index-delete":
        raw = [s for s in args.ids.split(",") if s]
        ids = [int(s) for s in raw] if args.id_type == "long" else raw
        n = S.ann_index_delete(spark, args.index, ids)
        print(f"index-delete ok: {n} vectors removed from {args.index}")
    else:
        queries = spark.read.parquet(args.queries)
        fn = S.ivfpq_query_index if args.kind == "ivfpq" else S.ivf_query_index
        out = fn(
            spark, args.index, queries, args.id_col, args.vec_col,
            k=args.k, nprobe=args.nprobe,
        )
        out.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(f"index-query ok: {n} result rows -> {args.out}")
    return 0


def snapshot_main(argv: list[str]) -> int:
    """Snapshot maintenance for a manifest-committed lake table — the
    reproducible-training-run surface:

    snapshot-pin    CONFIG.json --name NAME [--all]   pin current version(s)
    snapshot-list   CONFIG.json                       history + pins
    snapshot-unpin  CONFIG.json --name NAME [--all]
    snapshot-read   CONFIG.json (--version V | --name NAME) --out DIR

    ``--all`` pins/unpins every partition (the whole-table cut);
    ``snapshot-read --name`` reassembles that cut.
    """
    cmd = argv[0]
    p = argparse.ArgumentParser(prog="sri2db_spark " + cmd)
    p.add_argument("config", help="sync config JSON (db.committer=manifest)")
    p.add_argument("--master", default=None)
    if cmd in ("snapshot-pin", "snapshot-unpin"):
        p.add_argument("--name", required=True)
        p.add_argument("--all", action="store_true", dest="all_partitions")
    elif cmd == "snapshot-read":
        p.add_argument("--version", default=None)
        p.add_argument("--name", default=None)
        p.add_argument("--out", required=True)
    args = p.parse_args(argv[1:])
    with open(args.config) as f:
        cfg = json.load(f)
    api, db = cfg.get("api", {}), cfg.get("db", {})
    layout = LAYOUTS[db.get("layout", "large")]
    spark = get_spark(app_name="sri2db_spark_snapshot", master=args.master)
    table = LakeTable(
        spark, db["location"], layout, committer=_committer_for(db)
    )
    baseurl = api["baseUrl"] if layout.has_baseurl else None
    path = api["path"] if layout.has_path else None
    if cmd == "snapshot-pin":
        if args.all_partitions:
            pinned = table.pin_table(args.name)
            for (b, pt), v in sorted(pinned.items(), key=str):
                print(f"pinned {args.name} @ {b} {pt} -> {v}")
        else:
            version = table.pin_partition(baseurl, path, args.name)
            print(f"pinned {args.name} -> {version}")
    elif cmd == "snapshot-unpin":
        if args.all_partitions:
            table.unpin_table(args.name)
        else:
            table.unpin_partition(baseurl, path, args.name)
        print(f"unpinned {args.name}")
    elif cmd == "snapshot-list":
        part = table._partition_dir(baseurl, path)
        pins: dict[str, list[str]] = {}
        for n, v in sorted(table.committer.pins(part).items()):
            pins.setdefault(v, []).append(n)
        for seq, version in table.partition_history(baseurl, path):
            names = pins.get(version)
            pin = f"  pin={','.join(names)}" if names else ""
            print(f"{seq:6d}  {version}{pin}")
    else:
        if (args.version is None) == (args.name is None):
            p.error("snapshot-read needs exactly one of --version / --name")
        if args.name is not None:
            df = table.read_table_snapshot(args.name)
        else:
            df = table.read_partition_snapshot(baseurl, path, args.version)
        df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(f"snapshot-read ok: {n} rows -> {args.out}")
    return 0


def state_main(argv: list[str]) -> int:
    """Curation-state / streaming-output maintenance:

    state-compact  --state DIR [--committer rename|manifest] [--incremental]
    state-retract  --state DIR --ids ID[,ID…] [--id-type long|string]
                   [--committer rename|manifest]
    output-compact --dir DIR [--keys col[,col…]] [--incremental]
    output-retract --dir DIR --ids ID[,ID…] [--id-col doc_id]
                   [--id-type long|string]

    ``--committer manifest`` routes the state rewrite through the
    object-store commit protocol (one atomic pointer publish — a reader
    mid-maintenance sees old-or-new, never a missing store). Quiesce the
    ingest stream first either way: maintenance folds all but the
    replay-protected history.
    """
    cmd = argv[0]
    p = argparse.ArgumentParser(prog="sri2db_spark " + cmd)
    p.add_argument("--master", default=None)
    if cmd in ("state-compact", "state-retract"):
        p.add_argument("--state", required=True, help="curation state dir")
        p.add_argument(
            "--committer", default="rename", choices=["rename", "manifest"]
        )
    if cmd == "state-compact":
        p.add_argument(
            "--incremental",
            action="store_true",
            help="fold only the appends; carry the existing base by "
            "reference (O(batch) write; manifest committer only)",
        )
    if cmd == "output-compact":
        p.add_argument(
            "--incremental",
            action="store_true",
            help="minor fold: only positive-token batch dirs collapse; "
            "prior compacted bases are left in place (O(batch) write)",
        )
    if cmd in ("state-retract", "output-retract"):
        p.add_argument("--ids", required=True, help="comma-separated doc ids")
        p.add_argument("--id-type", default="long", choices=["long", "string"])
    if cmd in ("output-compact", "output-retract"):
        p.add_argument("--dir", required=True, help="batch_id=* output dir")
    if cmd == "output-compact":
        p.add_argument("--keys", default=None, help="dedup columns, comma-sep")
    if cmd == "output-retract":
        p.add_argument("--id-col", default="doc_id")
    args = p.parse_args(argv[1:])
    if (
        cmd == "state-compact"
        and args.incremental
        and args.committer != "manifest"
    ):
        p.error(
            "--incremental requires --committer manifest: the fold carries "
            "the existing base by reference, which only the manifest "
            "pointer protocol can publish"
        )
    spark = get_spark(app_name="sri2db_spark_state", master=args.master)
    from .functions import pipeline as P  # noqa: PLC0415
    from .sinks.committer import CommitConflict  # noqa: PLC0415

    if cmd == "state-compact":
        try:
            rep = P.compact_curation_state(
                spark,
                args.state,
                committer=_committer_for({"committer": args.committer}),
                incremental=args.incremental,
            )
        except CommitConflict as e:
            print(f"state-compact conflict: {e}")
            return 3
        for sub, (before, after) in sorted(rep.items()):
            print(f"state-compact {sub}: {before} -> {after} files")
    elif cmd == "state-retract":
        raw = [s for s in args.ids.split(",") if s]
        ids = [int(s) for s in raw] if args.id_type == "long" else raw
        try:
            P.retract_from_state(
                spark, args.state, ids,
                committer=_committer_for({"committer": args.committer}),
            )
        except CommitConflict as e:
            print(f"state-retract conflict (re-run to retry): {e}")
            return 3
        print(f"state-retract ok: {len(ids)} ids removed from {args.state}")
    elif cmd == "output-retract":
        raw = [s for s in args.ids.split(",") if s]
        ids = [int(s) for s in raw] if args.id_type == "long" else raw
        n = P.retract_from_output(
            spark, args.dir, ids, id_col=args.id_col
        )
        print(f"output-retract ok: {n} rows removed from {args.dir}")
    else:
        keys = args.keys.split(",") if args.keys else None
        before, after = P.compact_batch_output(
            spark, args.dir, keys=keys, incremental=args.incremental
        )
        print(f"output-compact: {before} -> {after} files")
    return 0


def rtbf_main(argv: list[str]) -> int:
    """One right-to-be-forgotten request across every persisted artifact,
    with a crash-resumable audit record:

    rtbf --ids ID[,ID…] --log DIR [--state DIR] [--output DIR]
         [--index DIR] [--zordered DIR] [--id-col doc_id]
         [--id-type long|string] [--committer rename|manifest]

    Re-running the same id list resumes a crashed request (artifacts
    already recorded are skipped) or no-ops a completed one. Exit 3 on a
    CAS conflict with concurrent maintenance — re-run to retry. Exit 4
    when the record is still INCOMPLETE after this run (a resubmission
    that named only a subset of the request's artifacts) — the message
    lists the unrecorded artifacts; re-run naming them.
    """
    p = argparse.ArgumentParser(prog="sri2db_spark rtbf")
    p.add_argument("--ids", required=True, help="comma-separated doc ids")
    p.add_argument("--id-type", default="long", choices=["long", "string"])
    p.add_argument("--log", required=True, help="audit log dir")
    p.add_argument("--state", default=None, help="curation state dir")
    p.add_argument("--output", default=None, help="batch_id=* output dir")
    p.add_argument("--index", default=None, help="saved ANN index dir")
    p.add_argument(
        "--zordered", default=None,
        help="zordered skipping table dir (needs --committer manifest)",
    )
    p.add_argument("--id-col", default="doc_id")
    p.add_argument(
        "--committer", default="rename", choices=["rename", "manifest"]
    )
    p.add_argument("--master", default=None)
    args = p.parse_args(argv[1:])
    if not (args.state or args.output or args.index or args.zordered):
        p.error(
            "name at least one artifact: --state / --output / --index / "
            "--zordered"
        )
    if args.zordered and args.committer != "manifest":
        p.error("--zordered requires --committer manifest (versioned table)")
    raw = [s.strip() for s in args.ids.split(",") if s.strip()]
    if not raw:
        # '--ids ,' or all-whitespace would otherwise surface as
        # rtbf_delete's uncaught ValueError traceback
        p.error("--ids: no ids given (expected comma-separated values)")
    if args.id_type == "long":
        try:
            ids = [int(s) for s in raw]
        except ValueError as e:
            p.error(
                f"--ids: {e}; pass --id-type string for string-keyed tables"
            )
    else:
        ids = raw
    spark = get_spark(app_name="sri2db_spark_rtbf", master=args.master)
    from .functions.rtbf import rtbf_delete  # noqa: PLC0415
    from .sinks.committer import CommitConflict  # noqa: PLC0415

    try:
        rec = rtbf_delete(
            spark, ids, args.log,
            state_dir=args.state, output_dir=args.output,
            index_path=args.index, zordered_path=args.zordered,
            id_col=args.id_col,
            committer=_committer_for({"committer": args.committer}),
        )
    except CommitConflict as e:
        print(f"rtbf conflict (re-run to resume): {e}")
        return 3
    parts = ", ".join(
        f"{a}={info['removed']}" for a, info in sorted(rec["artifacts"].items())
    )
    if not rec["completed"]:
        # a partial resubmission of a crashed request legitimately returns
        # an incomplete record (rtbf_delete only runs what THIS call
        # names); the operator-facing signal must not read as success
        # while an artifact of the request is still unrecorded
        missing = sorted(set(rec["requested"]) - set(rec["artifacts"]))
        print(
            f"rtbf INCOMPLETE: request {rec['request_id']} "
            f"({rec['n_ids']} ids): {parts}; still unrecorded: "
            f"{', '.join(missing)} — re-run naming those artifacts"
        )
        return 4
    print(f"rtbf ok: request {rec['request_id']} ({rec['n_ids']} ids): {parts}")
    return 0


def layout_main(argv: list[str]) -> int:
    """Z-ordered-table maintenance:

    zorder-compact --table DIR [--min-depth N] [--n-files N]

    Incremental re-cluster (LSM minor compaction) of an append_zordered
    table: merges only connected components of ``--min-depth`` or more
    generations whose stat rectangles overlap on every z-column; disjoint
    generations are carried untouched. Run when ``doctor --store`` hints a
    re-cluster; exit 3 on a CAS conflict with a concurrent append (re-run
    to retry on the new basis).
    """
    p = argparse.ArgumentParser(prog="sri2db_spark zorder-compact")
    p.add_argument("--table", required=True, help="zordered table dir")
    p.add_argument("--min-depth", type=int, default=3)
    p.add_argument("--n-files", type=int, default=None)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv[1:])
    spark = get_spark(app_name="sri2db_spark_layout", master=args.master)
    from .functions.layout import compact_zordered  # noqa: PLC0415
    from .sinks.committer import CommitConflict, ManifestCommitter  # noqa: PLC0415

    try:
        rep = compact_zordered(
            spark,
            args.table,
            committer=ManifestCommitter(),
            min_depth=args.min_depth,
            n_files=args.n_files,
        )
    except CommitConflict as e:
        print(f"zorder-compact conflict (re-run to retry): {e}")
        return 3
    if rep["committed"]:
        print(
            f"zorder-compact ok: {rep['generations_merged']} generations "
            f"({rep['merged_files']} files) merged, "
            f"{rep['carried_files']} files carried"
        )
    else:
        print("zorder-compact: no overlapping generation group; nothing to do")
    return 0


def doctor_main(argv: list[str]) -> int:
    """Read-only health check of an on-disk structure:

    doctor --state DIR | --lake DIR | --output DIR | --store DIR |
           --index DIR | --rtbf-log DIR   [--committer rename|manifest]

    Prints one JSON report; exit 0 when healthy, 4 when invariant
    violations were found (never repairs — each issue names the
    maintenance command that does)."""
    from .functions import doctor as D  # noqa: PLC0415

    p = argparse.ArgumentParser(prog="sri2db_spark doctor")
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--state", help="curation state dir")
    g.add_argument("--lake", help="lake table location")
    g.add_argument("--output", help="batch_id=* output dir")
    g.add_argument("--store", help="one versioned store dir")
    g.add_argument("--index", help="saved ANN index dir")
    g.add_argument("--rtbf-log", dest="rtbf_log", help="rtbf audit log dir")
    p.add_argument(
        "--committer", default="manifest", choices=["rename", "manifest"]
    )
    args = p.parse_args(argv[1:])
    mc = _committer_for({"committer": args.committer})
    if args.state:
        rep = D.check_curation_state(args.state, committer=mc)
    elif args.lake:
        rep = D.check_lake(args.lake, committer=mc)
    elif args.output:
        rep = D.check_batch_output(args.output, fs=mc.fs)
    elif args.index:
        rep = D.check_ann_index(args.index, fs=mc.fs)
    elif args.rtbf_log:
        rep = D.check_rtbf_log(args.rtbf_log, fs=mc.fs)
    else:
        rep = D.check_versioned_store(args.store, committer=mc)
    print(json.dumps(rep, indent=2, sort_keys=True))
    return 0 if rep["healthy"] else 4


def main(argv: list[str] | None = None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "doctor":
        return doctor_main(argv)
    if argv and argv[0] in (
        "index-build", "index-upsert", "index-delete", "index-query"
    ):
        return index_main(argv)
    if argv and argv[0] in (
        "snapshot-pin", "snapshot-list", "snapshot-unpin", "snapshot-read"
    ):
        return snapshot_main(argv)
    if argv and argv[0] in (
        "state-compact", "state-retract", "output-compact", "output-retract"
    ):
        return state_main(argv)
    if argv and argv[0] == "zorder-compact":
        return layout_main(argv)
    if argv and argv[0] == "rtbf":
        return rtbf_main(argv)
    p = argparse.ArgumentParser(prog="sri2db_spark")
    p.add_argument("config", help="path to JSON config (single or multi)")
    p.add_argument("--synctype", default=None, help="override configured synctype")
    p.add_argument("--listen", action="store_true", help="stay up; sync per broadcast event")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    # "none" (with --listen) skips the initial configured sync and only
    # listens — reference README.md:46-49
    valid_synctypes = ("fullSync", "deltaSync", "safeDeltaSync", "none")
    if args.synctype and args.synctype not in valid_synctypes:
        p.error(f"--synctype must be one of {', '.join(valid_synctypes)}")
    try:
        with open(args.config) as f:
            cfg = json.load(f)
    except FileNotFoundError:
        p.error(f"config file not found: {args.config}")
    except json.JSONDecodeError as e:
        p.error(f"config is not valid JSON: {e}")

    spark = get_spark(app_name="sri2db_spark_cli", master=args.master)

    # single vs multi detection by presence of baseConfig (bin/sri2db.js:48)
    if "baseConfig" in cfg:
        configs = [merge_patch(cfg["baseConfig"], ow) for ow in cfg.get("overwrites", [])]
        clients = [build_sync(spark, c, args.dry_run) for c in configs]
        multi = Sri2DbMulti(clients, concurrency=int(cfg.get("concurrency", 1)))
        synctype = args.synctype or cfg["baseConfig"].get("synctype", "deltaSync")
        settled = multi.configured_sync(synctype)
        ok = True
        for c, s in zip(configs, settled):
            label = f"{c['api']['baseUrl']}{c['api']['path']}"
            if s.is_fulfilled:
                r = s.value
                print(f"{label}: {r.synctype} ok, {r.resources_synced} resources, "
                      f"{r.rows_after} rows, {r.elapsed_ms} ms")
            else:
                ok = False
                print(f"{label}: FAILED: {s.reason}")
        return 0 if ok else 1

    sync = build_sync(spark, cfg, args.dry_run)
    synctype = args.synctype or cfg.get("synctype", "deltaSync")
    if args.listen:
        # Reference: socket.io broadcast (client.js:1981-2047). A pluggable
        # event source keeps this testable; the default polls stdin lines as
        # events (each line = one trigger), which composes with any external
        # notifier process. The configured sync runs once up front unless
        # synctype is "none" (reference README.md:46-49); broadcast events
        # trigger broadcastSyncMethod (default deltaSync, README.md:72).
        if synctype != "none":
            r0 = sync.configured_sync(synctype)
            print(
                f"initial {r0.synctype}: {r0.resources_synced} resources, "
                f"{r0.rows_after} rows"
            )
        broadcast_sync = cfg.get("broadcastSyncMethod", "deltaSync")

        def connect():
            for line in sys.stdin:
                yield line.strip()

        listener = BroadcastListener(
            connect=connect, sync_fn=lambda: sync.configured_sync(broadcast_sync)
        ).start()
        try:
            while True:
                import time as _t

                _t.sleep(1)
        except KeyboardInterrupt:
            listener.stop()
            return 0

    if synctype == "none":
        print("synctype none: nothing to do (use --listen to wait for events)")
        return 0
    r = sync.configured_sync(synctype)
    print(
        f"{r.synctype}: {r.resources_synced} resources, {r.deletes_synced} deletes, "
        f"{r.rows_after} rows after, {r.elapsed_ms} ms"
        + (" (dry run)" if r.dry_run else "")
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
