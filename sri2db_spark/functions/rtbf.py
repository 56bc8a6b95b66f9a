"""One-call right-to-be-forgotten across every persisted artifact, with a
crash-resumable audit log.

Round 7 built the per-artifact deletion paths — curation state
(:func:`~.pipeline.retract_from_state`), published output
(:func:`~.pipeline.retract_from_output`), ANN index
(:func:`~.similarity.ann_index_delete`) — each O(touched), each
individually re-runnable. A real deletion request, though, is ONE request
against ALL of them, and a compliance review asks one question: "was
request X completed, and what did it touch?" This module is that layer:

- :func:`rtbf_delete` fans one id list out to every artifact the caller
  names, in a fixed order (state first — its hash-liveness probe needs
  the corpus text BEFORE the output loses it is already handled inside
  retract_from_state; the order here is for deterministic resumes).
- The audit record is a single JSON object per request, addressed by the
  request id (md5 of the sorted-id JSON array), updated after EVERY
  artifact completes: a crash mid-request leaves a partial record whose
  re-run SKIPS the artifacts already recorded and finishes the rest.
  Per-artifact counts are never double-counted; an artifact recorded by a
  RESUME run carries ``"resumed": true`` because its count is a floor —
  the prior run may have died between that artifact's (idempotent)
  deletion and its record, making the re-executed deletion count 0.
  Re-running a completed request naming the same-or-fewer artifacts is a
  no-op returning the recorded result; naming an artifact the record
  doesn't cover runs against exactly that artifact and extends the record.
- :func:`read_rtbf_log` reads the log directory back as a DataFrame for
  reporting ("all requests completed?" is one filter).

The log is evidence, not a lock: concurrent duplicate submissions of the
same request may both run (the artifact deletions are idempotent, so the
outcome is correct; counts land from whichever run records first).
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame

__all__ = ["read_rtbf_log", "request_id", "rtbf_delete"]


def request_id(ids: list) -> str:
    """Deterministic id of a deletion request: md5 over the JSON array of
    the sorted ids — stable across runs, engines, and id ordering, so
    resubmitting the same request resumes its record. JSON (not
    comma-joining) keeps distinct requests distinct: ``['a,b']`` vs
    ``['a', 'b']`` and ``[1, 2]`` vs ``['1', '2']`` would collide under a
    plain join and a later genuine request would silently no-op against
    the earlier record."""
    joined = json.dumps(sorted(ids, key=str), separators=(",", ":"))
    return hashlib.md5(joined.encode("utf-8")).hexdigest()


def rtbf_delete(
    spark,
    ids: list,
    log_dir: str,
    state_dir: str | None = None,
    output_dir: str | None = None,
    index_path: str | None = None,
    zordered_path: str | None = None,
    committer=None,
    id_col: str = "doc_id",
    vec_ids: list | None = None,
    fs=None,
) -> dict:
    """Execute one right-to-be-forgotten request against every named
    artifact and record it in ``log_dir`` (see module docstring for the
    resume/idempotence contract). ``vec_ids`` overrides the id list for
    the ANN index when embedding ids differ from document ids;
    ``zordered_path`` adds a Z-ordered skipping table (training-export
    layout) as a fourth artifact — it needs the versioned ``committer``.
    Returns the completed audit record."""
    from ..sinks.fs import LocalFS  # noqa: PLC0415

    fs = fs or (committer.fs if committer is not None else LocalFS())
    if not ids:
        raise ValueError("rtbf_delete with no ids: nothing to forget")
    rid = request_id(ids)
    fs.makedirs(log_dir)
    rec_path = os.path.join(log_dir, f"{rid}.json")
    resuming = fs.exists(rec_path)
    if resuming:
        rec = json.loads(fs.read(rec_path))
    else:
        rec = {
            "request_id": rid,
            "n_ids": len(ids),
            "artifacts": {},
            "completed": False,
        }
    # "completed" is per ARTIFACT SET, not per id list: resubmitting the
    # same ids naming an artifact the earlier run didn't touch must run
    # against that artifact — short-circuiting on the old record would
    # report success for a deletion that never happened there
    requested = {
        name
        for name, target in (
            ("state", state_dir),
            ("output", output_dir),
            ("index", index_path),
            ("zordered", zordered_path),
        )
        if target is not None
    }
    # the stored completed bit alone is not trusted: records written by a
    # pre-coverage-fix build could say completed=true while an artifact in
    # their own requested set is unrecorded — re-check coverage here so a
    # laundered legacy record gets repaired (falls through, re-runs the
    # missing artifact with a resume floor) instead of returned as truth
    if (
        rec["completed"]
        and requested <= set(rec["artifacts"])
        and set(rec.get("requested", [])) <= set(rec["artifacts"])
    ):
        return rec
    # only an artifact a PRIOR run was already working toward can have
    # its idempotent re-execution under-count (deletion landed, record
    # didn't) — an artifact first named by THIS submission runs fresh and
    # its count is exact, even when extending an older record. The floor
    # set derives from REQUESTED-COVERAGE (requested minus recorded), not
    # the completed bit: a partial resubmission must not launder the
    # still-unrecorded artifact into an exact-looking zero later (review
    # r9, confirmed live). Records from before "requested" was stored
    # can't localize the mid-flight artifact, so a crashed legacy resume
    # conservatively floors everything unrecorded.
    if resuming and "requested" in rec:
        crash_floor = set(rec["requested"]) - set(rec["artifacts"])
    elif resuming and not rec["completed"]:
        crash_floor = requested - set(rec["artifacts"])
    else:
        crash_floor = set()
    rec["requested"] = sorted(requested | set(rec.get("requested", [])))
    rec["completed"] = False
    # persist BEFORE the first artifact runs: a crash inside the first
    # deletion must leave a completed=false record on disk, or
    # doctor --rtbf-log would report a log with no trace of the request —
    # the exact never-resumed state it exists to surface
    fs.put(rec_path, json.dumps(rec, sort_keys=True))

    def _record(name: str, removed) -> None:
        entry: dict = {"removed": removed}
        if name in crash_floor:
            # a crash may have landed BETWEEN this artifact's deletion and
            # its record on the prior run; the re-executed (idempotent)
            # deletion then counts 0, so resumed counts are a floor, not
            # an exact tally — flag them for the audit reader
            entry["resumed"] = True
        rec["artifacts"][name] = entry
        fs.put(rec_path, json.dumps(rec, sort_keys=True))

    # fixed order for deterministic resumes; each step skipped if already
    # recorded by a prior (crashed) run of this request
    if state_dir is not None and "state" not in rec["artifacts"]:
        from .pipeline import retract_from_state  # noqa: PLC0415

        retract_from_state(spark, state_dir, ids, committer=committer)
        # retract_from_state returns None (multi-store); record the request
        # size — the per-store counts live in the state's own history
        _record("state", len(ids))
    if output_dir is not None and "output" not in rec["artifacts"]:
        from .pipeline import retract_from_output  # noqa: PLC0415

        n = retract_from_output(
            spark, output_dir, ids, id_col=id_col, fs=fs
        )
        _record("output", n)
    if index_path is not None and "index" not in rec["artifacts"]:
        from .similarity import ann_index_delete  # noqa: PLC0415

        n = ann_index_delete(spark, index_path, vec_ids or ids, fs=fs)
        _record("index", n)
    if zordered_path is not None and "zordered" not in rec["artifacts"]:
        from .layout import retract_from_zordered  # noqa: PLC0415

        n = retract_from_zordered(
            spark, zordered_path, ids, id_col, committer=committer
        )
        _record("zordered", n)

    # completed means EVERY artifact the request has ever named is
    # recorded — a resubmission naming only a subset of a crashed run's
    # artifacts must not flip the record to complete while the crashed
    # run's other artifact is still unrecorded (doctor --rtbf-log would
    # stop flagging it and the compliance record would lie)
    rec["completed"] = set(rec["requested"]) <= set(rec["artifacts"])
    fs.put(rec_path, json.dumps(rec, sort_keys=True))
    return rec


def read_rtbf_log(spark, log_dir: str, fs=None) -> DataFrame:
    """The audit log as a DataFrame: one row per (request, artifact) —
    ``request_id, n_ids, completed, artifact, removed``. Driver reads the
    records (requests-scale, not data-scale) and parallelizes; an empty
    or missing log is an empty frame with the right schema."""
    from ..sinks.fs import LocalFS  # noqa: PLC0415

    fs = fs or LocalFS()
    rows = []
    if fs.isdir(log_dir):
        for name in sorted(fs.listdir(log_dir)):
            if not name.endswith(".json"):
                continue
            rec = json.loads(fs.read(os.path.join(log_dir, name)))
            for artifact, info in sorted(rec.get("artifacts", {}).items()):
                rows.append(
                    (
                        rec["request_id"],
                        int(rec["n_ids"]),
                        bool(rec["completed"]),
                        artifact,
                        int(info["removed"]),
                    )
                )
    return spark.createDataFrame(
        rows, "request_id string, n_ids bigint, completed boolean, "
        "artifact string, removed bigint"
    )
