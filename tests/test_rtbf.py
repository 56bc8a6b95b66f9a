"""One-call RTBF across state + output + index with a crash-resumable
audit log (functions/rtbf.py)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

import sri2db_spark.functions.similarity as S
from sri2db_spark.functions import pipeline as P
from sri2db_spark.functions import rtbf as R
from sri2db_spark.functions.statestore import read_store
from sri2db_spark.plans.analytics import _t, _tp
from sri2db_spark.sinks.committer import ManifestCommitter

SF = "/root/testdata/sf0.001"


def _setup(spark, tmp_path):
    docs = _t(spark, SF, "documents").filter(F.col("doc_id") % 3 == 0)
    emb = _tp(spark, SF, "embeddings")
    mc = ManifestCommitter()
    state, out, idx, log = (
        str(tmp_path / d) for d in ("st", "out", "idx", "log")
    )
    P.init_curation_state(docs, state, "doc_id", "text", committer=mc)
    for b in range(3):
        docs.filter((F.col("doc_id") / 3 % 3).cast("long") == b).select(
            "doc_id", "lang"
        ).write.parquet(f"{out}/batch_id={b}")
    S.build_ivf_index(emb, idx, nlist=8)
    return docs, mc, state, out, idx, log


def test_rtbf_reaches_every_artifact_and_is_idempotent(spark, tmp_path):
    docs, mc, state, out, idx, log = _setup(spark, tmp_path)
    ids = [0, 9, 33]
    rec = R.rtbf_delete(
        spark, ids, log,
        state_dir=state, output_dir=out, index_path=idx, committer=mc,
    )
    assert rec["completed"]
    assert rec["request_id"] == R.request_id(ids)
    assert rec["artifacts"]["output"]["removed"] == 3
    assert rec["artifacts"]["index"]["removed"] == 3

    # the ids are gone from every artifact
    corpus_ids = {r["id"] for r in read_store(spark, f"{state}/corpus", committer=mc).collect()}
    assert not corpus_ids & set(ids)
    out_ids = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert not out_ids & set(ids)
    idx_ids = {r.id for r in spark.read.parquet(f"{idx}/cells").collect()}
    assert not idx_ids & set(ids)

    # resubmitting the same request is a recorded no-op
    rec2 = R.rtbf_delete(
        spark, [33, 9, 0], log,  # order-independent request identity
        state_dir=state, output_dir=out, index_path=idx, committer=mc,
    )
    assert rec2 == rec

    # the log reads back as a table
    rows = {
        (r.artifact, r.removed)
        for r in R.read_rtbf_log(spark, log).collect()
    }
    assert rows == {("state", 3), ("output", 3), ("index", 3)}


def test_rtbf_crash_mid_request_resumes_without_rerunning(spark, tmp_path):
    """Die after the state artifact: the partial record names it, the
    re-run skips straight to output+index, and the final record carries
    the FIRST run's state entry (never double-counted)."""
    docs, mc, state, out, idx, log = _setup(spark, tmp_path)
    ids = [0, 9]

    calls = []
    orig = P.retract_from_output

    def boom(*a, **kw):
        calls.append(True)
        raise RuntimeError("crash injected after state retraction")

    P.retract_from_output = boom
    try:
        with pytest.raises(RuntimeError, match="crash injected"):
            R.rtbf_delete(
                spark, ids, log,
                state_dir=state, output_dir=out, index_path=idx, committer=mc,
            )
    finally:
        P.retract_from_output = orig
    rid = R.request_id(ids)
    partial = json.loads(open(os.path.join(log, f"{rid}.json")).read())
    assert not partial["completed"]
    assert set(partial["artifacts"]) == {"state"}

    # resume: state must NOT re-run (its ids are already gone; a second
    # retraction would be a wasted O(touched) rewrite)
    state_version_before = mc.resolve(f"{state}/corpus")
    rec = R.rtbf_delete(
        spark, ids, log,
        state_dir=state, output_dir=out, index_path=idx, committer=mc,
    )
    assert rec["completed"]
    assert set(rec["artifacts"]) == {"state", "output", "index"}
    assert mc.resolve(f"{state}/corpus") == state_version_before
    out_ids = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert not out_ids & set(ids)


def test_rtbf_cli_roundtrip(spark, tmp_path, capsys):
    from sri2db_spark import cli

    docs, mc, state, out, idx, log = _setup(spark, tmp_path)
    # the CLI builds its own rename/manifest committer; state was
    # committed with the manifest protocol above
    code = cli.main(
        [
            "rtbf", "--ids", "0,9", "--log", log,
            "--output", out, "--index", idx,
        ]
    )
    assert code == 0
    msg = capsys.readouterr().out
    assert "rtbf ok" in msg and "output=2" in msg and "index=2" in msg
    assert R.read_rtbf_log(spark, log).count() == 2

    with pytest.raises(SystemExit):
        cli.main(["rtbf", "--ids", "1", "--log", log])  # no artifact named

    with pytest.raises(ValueError, match="nothing to forget"):
        R.rtbf_delete(spark, [], log, output_dir=out)


def test_request_id_encoding_is_unambiguous():
    """Distinct requests must never collide to one record: a collision
    means a later genuine deletion silently no-ops against the earlier
    completed record."""
    assert R.request_id(["a,b"]) != R.request_id(["a", "b"])
    assert R.request_id([1, 2]) != R.request_id(["1", "2"])
    assert R.request_id([0, 9, 33]) == R.request_id([33, 0, 9])


def test_rtbf_completed_record_extends_to_new_artifacts(spark, tmp_path):
    """'completed' is per artifact SET: resubmitting the same ids naming
    an artifact the first run didn't touch must delete from it (and
    extend the record), not short-circuit to a false success."""
    docs, mc, state, out, idx, log = _setup(spark, tmp_path)
    ids = [0, 9]
    rec1 = R.rtbf_delete(spark, ids, log, output_dir=out)
    assert rec1["completed"] and set(rec1["artifacts"]) == {"output"}
    # index still holds the ids
    assert {r.id for r in spark.read.parquet(f"{idx}/cells").collect()} >= set(ids)

    rec2 = R.rtbf_delete(spark, ids, log, output_dir=out, index_path=idx)
    assert rec2["completed"]
    assert set(rec2["artifacts"]) == {"output", "index"}
    # the extension actually deleted; output's original count untouched
    assert not (
        {r.id for r in spark.read.parquet(f"{idx}/cells").collect()} & set(ids)
    )
    assert rec2["artifacts"]["output"] == rec1["artifacts"]["output"]
    # the extension's index delete ran for the FIRST time here — its count
    # is exact, NOT a resume floor (the prior run completed and never
    # touched the index), so it must not carry the resumed flag (ADVICE r8)
    assert rec2["artifacts"]["index"].get("resumed") is None
    assert rec2["artifacts"]["index"]["removed"] == 2


def test_doctor_rtbf_log(spark, tmp_path, capsys):
    """doctor --rtbf-log: complete logs are healthy; an incomplete request
    (crashed, never resumed) is an ISSUE — exactly the state a compliance
    review must not miss; resumed-count floors are info."""
    from sri2db_spark import cli
    from sri2db_spark.functions import doctor as D

    docs, mc, state, out, idx, log = _setup(spark, tmp_path)
    R.rtbf_delete(spark, [0, 9], log, output_dir=out)
    rep = D.check_rtbf_log(log)
    assert rep["healthy"] and rep["info"]["requests"] == 1
    assert cli.main(["doctor", "--rtbf-log", log]) == 0
    capsys.readouterr()

    # crash a second request inside its FIRST artifact: the record must
    # already exist on disk (persisted before the artifact loop) or the
    # doctor would see no trace of the never-resumed request at all
    def boom(*a, **kw):
        raise RuntimeError("crash")

    orig_out = P.retract_from_output
    P.retract_from_output = boom
    try:
        with pytest.raises(RuntimeError):
            R.rtbf_delete(spark, [33], log, output_dir=out, index_path=idx)
    finally:
        P.retract_from_output = orig_out
    rep2 = D.check_rtbf_log(log)
    assert not rep2["healthy"]
    assert rep2["info"]["incomplete_requests"] == [R.request_id([33])]
    assert cli.main(["doctor", "--rtbf-log", log]) == 4
    capsys.readouterr()

    # resuming clears it (and flags the resumed floor as info)
    R.rtbf_delete(spark, [33], log, output_dir=out, index_path=idx)
    rep3 = D.check_rtbf_log(log)
    assert rep3["healthy"]
    assert rep3["info"]["resumed_artifact_counts"] >= 1


def test_doctor_rtbf_log_tolerates_damaged_records(tmp_path):
    """Shape violations are issues, never crashes: a diagnostic tool for
    damaged logs must report the damage."""
    from sri2db_spark.functions import doctor as D

    log = str(tmp_path / "log")
    os.makedirs(log)
    open(f"{log}/a.json", "w").write("null")
    open(f"{log}/b.json", "w").write("{not json")
    open(f"{log}/c.json", "w").write(
        '{"request_id": "x", "n_ids": 1, "artifacts": null, "completed": false}'
    )
    rep = D.check_rtbf_log(log)
    assert not rep["healthy"]
    assert any("not a JSON object" in i for i in rep["issues"])
    assert any("not valid JSON" in i for i in rep["issues"])
    assert any("non-object artifacts" in i for i in rep["issues"])


def test_rtbf_covers_the_zordered_artifact(spark, tmp_path, capsys):
    """The fourth artifact: one request also scrubs a Z-ordered skipping
    table (training-export layout), recorded in the same audit record."""
    from sri2db_spark import cli
    from sri2db_spark.functions.layout import read_skipping, write_zordered

    docs, mc, state, out, idx, log = _setup(spark, tmp_path)
    zt = str(tmp_path / "zt")
    write_zordered(
        docs.select("doc_id", "n_chars"), zt, ["doc_id", "n_chars"],
        n_files=4, committer=mc,
    )
    rec = R.rtbf_delete(
        spark, [0, 9, 33], log,
        output_dir=out, zordered_path=zt, committer=mc,
    )
    assert rec["completed"]
    assert rec["artifacts"]["zordered"]["removed"] == 3
    left = read_skipping(spark, zt, {"doc_id": (None, None)}, committer=mc)
    assert not {0, 9, 33} & {r.doc_id for r in left.collect()}

    # CLI: zordered requires the manifest committer
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        cli.main(["rtbf", "--ids", "1", "--log", log, "--zordered", zt])
    code = cli.main(
        [
            "rtbf", "--ids", "42", "--log", log, "--zordered", zt,
            "--committer", "manifest",
        ]
    )
    assert code == 0
    assert "zordered=1" in capsys.readouterr().out


def test_rtbf_crash_resume_floors_only_original_artifacts(spark, tmp_path):
    """Resuming a crashed request with an EXTRA artifact: artifacts the
    crashed run was working toward are resume-floors (their deletion may
    have landed without a record), but the newly named artifact runs for
    the first time — its count is exact and carries no flag (ADVICE r8)."""
    docs, mc, state, out, idx, log = _setup(spark, tmp_path)

    def boom(*a, **kw):
        raise RuntimeError("crash")

    orig = P.retract_from_output
    P.retract_from_output = boom
    try:
        with pytest.raises(RuntimeError):
            R.rtbf_delete(spark, [7], log, output_dir=out)
    finally:
        P.retract_from_output = orig

    rec = R.rtbf_delete(spark, [7], log, output_dir=out, index_path=idx)
    assert rec["completed"]
    assert rec["artifacts"]["output"].get("resumed") is True  # mid-flight
    assert rec["artifacts"]["index"].get("resumed") is None  # first run
    assert sorted(rec["requested"]) == ["index", "output"]


def test_rtbf_cli_rejects_empty_and_malformed_ids(capsys):
    """'--ids ,' (empty after split) and non-integer tokens must exit as
    argparse errors (code 2), not uncaught tracebacks (ADVICE r8)."""
    from sri2db_spark import cli

    for bad in [",", " , ", ""]:
        with pytest.raises(SystemExit) as ei:
            cli.main(["rtbf", "--ids", bad, "--log", "/tmp/x", "--output", "/tmp/y"])
        assert ei.value.code == 2
        assert "no ids given" in capsys.readouterr().err

    with pytest.raises(SystemExit) as ei:
        cli.main(["rtbf", "--ids", "1,abc", "--log", "/tmp/x", "--output", "/tmp/y"])
    assert ei.value.code == 2
    assert "--id-type string" in capsys.readouterr().err


def test_rtbf_partial_resubmission_cannot_launder_the_crashed_artifact(
    spark, tmp_path
):
    """Resume a crashed {output,index} request naming ONLY output: the
    record must stay completed=false (the index deletion is unrecorded —
    doctor keeps flagging it), and a later full resubmission must floor
    the index count, not present its idempotent 0 as exact (review r9,
    confirmed live)."""
    from sri2db_spark.functions import doctor as Doc

    docs, mc, state, out, idx, log = _setup(spark, tmp_path)
    ids = [0, 9]

    def boom(*a, **kw):
        raise RuntimeError("crash")

    # run 1: {output, index}; output lands+records, index deletion LANDS
    # but its record does not (crash between deletion and record)
    import sri2db_spark.functions.similarity as S_

    orig_del = S_.ann_index_delete

    def delete_then_crash(*a, **kw):
        orig_del(*a, **kw)
        raise RuntimeError("crash after deletion, before record")

    S_.ann_index_delete = delete_then_crash
    try:
        with pytest.raises(RuntimeError):
            R.rtbf_delete(spark, ids, log, output_dir=out, index_path=idx)
    finally:
        S_.ann_index_delete = orig_del

    # run 2: partial resubmission naming only output — nothing new runs,
    # and the record must NOT flip to completed
    rec2 = R.rtbf_delete(spark, ids, log, output_dir=out)
    assert rec2["completed"] is False
    assert set(rec2["requested"]) == {"index", "output"}
    assert set(rec2["artifacts"]) == {"output"}
    rep = Doc.check_rtbf_log(log)
    assert not rep["healthy"]  # doctor still flags the pending index

    # run 3: full resubmission — the index count is a resume FLOOR (the
    # idempotent re-delete counts 0; the data already went in run 1)
    rec3 = R.rtbf_delete(spark, ids, log, output_dir=out, index_path=idx)
    assert rec3["completed"] is True
    assert rec3["artifacts"]["index"].get("resumed") is True
    assert rec3["artifacts"]["index"]["removed"] == 0  # floor, flagged
    assert Doc.check_rtbf_log(log)["healthy"]


def test_rtbf_cli_incomplete_record_exits_nonzero(spark, tmp_path, capsys):
    """A partial resubmission of a crashed request leaves the record
    incomplete — the CLI must say so and exit 4, not print 'rtbf ok'
    (review r9: the operator-facing compliance signal)."""
    from sri2db_spark import cli

    docs, mc, state, out, idx, log = _setup(spark, tmp_path)

    import sri2db_spark.functions.similarity as S_

    orig_del = S_.ann_index_delete

    def boom(*a, **kw):
        raise RuntimeError("crash")

    S_.ann_index_delete = boom
    try:
        with pytest.raises(RuntimeError):
            R.rtbf_delete(spark, [0, 9], log, output_dir=out, index_path=idx)
    finally:
        S_.ann_index_delete = orig_del

    code = cli.main(["rtbf", "--ids", "0,9", "--log", log, "--output", out])
    assert code == 4
    msg = capsys.readouterr().out
    assert "rtbf INCOMPLETE" in msg and "index" in msg

    code2 = cli.main(
        ["rtbf", "--ids", "0,9", "--log", log, "--output", out, "--index", idx]
    )
    assert code2 == 0
    assert "rtbf ok" in capsys.readouterr().out


def test_rtbf_laundered_legacy_record_is_repaired(spark, tmp_path):
    """A record written by a pre-coverage-fix build (completed=true with an
    artifact in its own requested set unrecorded) must not short-circuit
    as truth: a resubmission re-checks coverage, repairs the bit, and a
    full resubmission floors the missing artifact (review r9)."""
    import json as _json
    import os as _os

    docs, mc, state, out, idx, log = _setup(spark, tmp_path)
    ids = [0, 9]
    rid = R.request_id(ids)
    _os.makedirs(log, exist_ok=True)
    # hand-write the laundered legacy shape
    rec = {
        "request_id": rid,
        "n_ids": 2,
        "requested": ["index", "output"],
        "artifacts": {"output": {"removed": 2}},
        "completed": True,
    }
    open(_os.path.join(log, f"{rid}.json"), "w").write(_json.dumps(rec))

    # subset resubmission: must NOT return the lying record unchanged
    rec2 = R.rtbf_delete(spark, ids, log, output_dir=out)
    assert rec2["completed"] is False

    # full resubmission: runs the missing artifact with a resume floor
    rec3 = R.rtbf_delete(spark, ids, log, output_dir=out, index_path=idx)
    assert rec3["completed"] is True
    assert rec3["artifacts"]["index"].get("resumed") is True
