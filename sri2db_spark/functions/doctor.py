"""Read-only health checks for every on-disk structure the engine
maintains — the operational "is my store sane?" probe an operator runs
before/after maintenance, after a crash, or when a read errors.

Each check walks ONE structure with the same filesystem binding the
writers use (local or object-store), validates the commit-protocol
invariants the writers promise, and returns a plain dict report:

``{"path", "kind", "healthy", "issues": [...], "info": {...}}``

Issues are invariant VIOLATIONS (corruption, dangling references);
``info`` carries benign observations (reclaimable crashed stages, fenced
garbage awaiting sweep, pinned snapshots). Everything here is read-only:
the doctor never repairs, it points at the maintenance command that
does.

Mirrors the reference's startup catalog probe
(``/root/reference/src/lib/client.js:361-410``, which aborts on an
incompatible table) extended to the engine's own artifacts.
"""

from __future__ import annotations

import json
import os

from .statestore import CARRY_MARKER, FOLDED_MARKER, PRUNE_STATS
from .layout import FILE_STATS


def _committer_fs(committer):
    from ..sinks.committer import ManifestCommitter  # noqa: PLC0415

    mc = committer or ManifestCommitter()
    return mc, mc.fs


def check_versioned_store(path: str, committer=None) -> dict:
    """Validate one manifest-committed store directory (a curation state
    sub-store, a zordered table, a lake partition): the pointer resolves
    to an existing version, every carried reference exists (transitively),
    stats parse and cover the version's own + carried files, and pins
    point at live dirs. Crashed stages and fenced garbage are reported as
    reclaimable info, not issues — the next successful commit sweeps
    them."""
    mc, fs = _committer_fs(committer)
    issues: list[str] = []
    info: dict = {}
    report = {"path": path, "kind": "versioned_store", "issues": issues, "info": info}
    if not mc.versioned:
        # rename-committer layout: a plain directory, no versions/pins/
        # carries to validate — existence and readability are the checks
        report["kind"] = "flat_store"
        if not fs.isdir(path):
            issues.append("store does not exist")
        else:
            info["files"] = sum(
                1 for f in fs.walk_files(path) if f.endswith(".parquet")
            )
        report["healthy"] = not issues
        return report

    current = mc.resolve(path)
    if current is None:
        issues.append("no committed version (missing or unreadable manifest)")
        report["healthy"] = False
        return report
    info["current_version"] = os.path.basename(current)
    if not fs.isdir(current):
        issues.append(
            f"manifest points at {os.path.basename(current)}, which does not exist"
        )
        report["healthy"] = False
        return report

    # pins must reference existing version dirs
    pins = mc.pins(path)
    info["pins"] = dict(pins)
    for name, version in pins.items():
        if not fs.isdir(os.path.join(path, version)):
            issues.append(f"pin {name!r} references missing version {version}")

    # carried references (from the current version, pinned versions, and
    # retained history) must exist — GC promises to keep them
    live = {os.path.basename(current), *pins.values()}
    refs = mc._carry_refs(path, live)  # noqa: SLF001
    for ref in sorted(refs):
        if not fs.isdir(os.path.join(path, ref)):
            issues.append(
                f"carried version {ref} is referenced but does not exist "
                "(the store would fail loudly on read; restore from a "
                "snapshot or re-initialize)"
            )
    # per-file carried entries of the current version
    carry_path = os.path.join(current, CARRY_MARKER)
    carried: list[str] = []
    if fs.exists(carry_path):
        carried = [ln for ln in fs.read(carry_path).splitlines() if ln]
        for entry in carried:
            if not fs.exists(os.path.join(path, entry)):
                issues.append(f"carried file {entry} is missing")
    info["carried_files"] = len(carried)

    # stats (state-store or zordered flavor) should cover own + carried
    own = [
        os.path.basename(f)
        for f in fs.walk_files(current)
        if f.endswith(".parquet")
    ]
    info["own_files"] = len(own)
    for stats_name in (PRUNE_STATS, FILE_STATS):
        sp = os.path.join(current, stats_name)
        if not fs.exists(sp):
            continue
        try:
            meta = json.loads(fs.read(sp))
        except ValueError:
            issues.append(f"{stats_name} is not valid JSON")
            continue
        if not isinstance(meta, dict) or not isinstance(meta.get("files"), dict):
            issues.append(
                f"{stats_name} is malformed (no 'files' mapping); "
                "maintenance would fall back to unpruned rewrites"
            )
            continue
        covered = set(meta["files"])
        # two stats flavors share the shape: the state stores key every
        # entry store-root-relative (v_current/part-…), the zordered
        # layout keys the version's own files by bare basename
        cur_name = os.path.basename(current)
        own_keys = set(own) | {f"{cur_name}/{n}" for n in own}
        expected = own_keys | set(carried)
        missing = {
            n for n in own if n not in covered and f"{cur_name}/{n}" not in covered
        } | (set(carried) - covered)
        info[stats_name] = {"entries": len(covered)}
        if missing:
            # NOT an issue: the prune planner treats stats-less files
            # conservatively (always rewritten / always scanned), and an
            # empty part file legitimately has no stats row. It only
            # costs pruning efficiency, so report it as info.
            info[stats_name]["uncovered_files"] = len(missing)
        dangling = covered - expected
        if dangling:
            issues.append(
                f"{stats_name} lists {len(dangling)} file(s) that are not "
                f"committed (e.g. {sorted(dangling)[0]}); reads planned "
                "from these stats would fail"
            )
        if stats_name == FILE_STATS:
            info[stats_name].update(_zorder_generation_metrics(meta, carried))

    # benign leftovers: version dirs that are neither current, pinned,
    # carried, nor retained history — crashed stages or swept-later garbage
    markers = {v for _s, v in mc._markers(path)}  # noqa: SLF001
    versions = {
        d
        for d in fs.listdir(path)
        if d.startswith("v_") and fs.isdir(os.path.join(path, d))
    }
    keep = {os.path.basename(current)} | set(pins.values()) | refs
    retained = {v for v in versions & markers if v not in keep}
    orphans = versions - keep - markers
    info["retained_history"] = len(retained)
    if orphans:
        info["reclaimable_stage_dirs"] = sorted(orphans)
    folded = os.path.join(current, FOLDED_MARKER)
    if fs.exists(folded):
        fenced = [ln for ln in fs.read(folded).splitlines() if ln]
        still_there = [e for e in fenced if fs.exists(os.path.join(path, e))]
        if still_there:
            info["fenced_garbage_files"] = len(still_there)

    # streaming replay marks ride the committed version (zorder_ingest):
    # surface them so an operator can see which streams feed this table
    # and how far each has applied
    marks = {
        n: fs.read(os.path.join(current, n)).strip()
        for n in fs.listdir(current)
        if n.startswith("_STREAM_")
    }
    if marks:
        info["stream_marks"] = marks

    report["healthy"] = not issues
    return report


#: carried-generation count above which the doctor advises a full
#: write_zordered re-cluster: each append_zordered tick carries one more
#: generation by design, per-file ranges stay tight only WITHIN a
#: generation, and read_skipping's pruning decays as cross-generation
#: ranges overlap — at ~8 generations a typical ingest's files-per-point
#: has multiplied enough that the O(table) rewrite pays for itself
RECLUSTER_GENERATIONS = 8


def _zorder_generation_metrics(meta: dict, carried: list[str]) -> dict:
    """Carry-chain observability for an append_zordered table (verdict r7
    item 7): how many prior generations the current version carries, and
    how much their per-file stat ranges overlap — the two numbers an
    operator needs to decide WHEN to run the full :func:`write_zordered`
    re-cluster that drops the carries.

    ``generations_carried`` counts distinct version prefixes among the
    carried entries (append chains never deepen, so each prefix is one
    prior append/rewrite generation). ``files_per_point`` is, per stats
    column, Σ(file range length) / (union range length) over all
    committed files — the expected number of files a point predicate
    must scan. A freshly re-clustered table sits near 1.0; it grows
    toward the generation count as generations overlap. Numeric columns
    only (string ranges have no length); all driver-side over the
    n_files-scale stats object, no data read."""
    gens = {e.split("/", 1)[0] for e in carried if "/" in e}
    out: dict = {"generations_carried": len(gens)}
    files = meta.get("files", {})
    cols = meta.get("cols", [])
    fpp: dict[str, float] = {}
    for c in cols:
        spans = [
            (st[c][0], st[c][1])
            for st in files.values()
            if isinstance(st.get(c), list)
            and len(st[c]) == 2
            and all(isinstance(b, (int, float)) for b in st[c])
        ]
        if not spans:
            continue
        lo = min(s[0] for s in spans)
        hi = max(s[1] for s in spans)
        union = hi - lo
        if union <= 0:
            fpp[c] = float(len(spans))  # all files cover one point
            continue
        fpp[c] = round(sum(s[1] - s[0] for s in spans) / union, 2)
    if fpp:
        out["files_per_point"] = fpp
    if len(gens) >= RECLUSTER_GENERATIONS:
        out["hint"] = (
            f"{len(gens)} generations carried (>= {RECLUSTER_GENERATIONS}); "
            "run zorder-compact (compact_zordered — O(overlap), merges "
            "only overlapping generations, preserves _STREAM_* sidecars) "
            "or a full write_zordered rewrite to restore skipping "
            "selectivity"
        )
    return out


def check_curation_state(state_dir: str, committer=None) -> dict:
    """Doctor a whole curation state: each sub-store (hashes/sigs/corpus)
    checked individually; versioned layout required for the per-store
    checks, a flat (rename-committer) layout reports only existence."""
    mc, fs = _committer_fs(committer)
    subs = [
        s
        for s in ("hashes", "sigs", "corpus")
        if fs.isdir(os.path.join(state_dir, s))
    ]
    stores = {}
    issues: list[str] = []
    if not subs:
        issues.append("no curation sub-stores found (hashes/sigs/corpus)")
    for s in subs:
        sub_path = os.path.join(state_dir, s)
        stores[s] = check_versioned_store(sub_path, committer=mc)
        issues += [f"{s}: {i}" for i in stores[s]["issues"]]
    return {
        "path": state_dir,
        "kind": "curation_state",
        "healthy": not issues,
        "issues": issues,
        "info": {"stores": stores},
    }


def check_lake(location: str, committer=None) -> dict:
    """Doctor a lake table: every partition directory decodes (legacy
    UTF-8 escapes are an issue with a named migration), and on the
    versioned backend every partition store passes
    :func:`check_versioned_store`."""
    from ..sinks.lake import _is_legacy_segment  # noqa: PLC0415

    mc, fs = _committer_fs(committer)
    issues: list[str] = []
    info: dict = {"partitions": 0}
    report = {"path": location, "kind": "lake", "issues": issues, "info": info}
    if not fs.isdir(location):
        issues.append("location does not exist")
        report["healthy"] = False
        return report

    def _walk(d: str, depth: int) -> None:
        for name in fs.listdir(d):
            sub = os.path.join(d, name)
            if "=" in name and fs.isdir(sub):
                if _is_legacy_segment(name):
                    issues.append(
                        f"legacy UTF-8-escaped partition segment {name!r}; "
                        "run sinks.lake.migrate_legacy_partition_dirs once"
                    )
                    continue
                _walk(sub, depth + 1)
            elif name.startswith("v_") or name == "_MANIFEST":
                # reached a partition store dir: check it once
                if d not in checked:
                    checked.add(d)
                    info["partitions"] += 1
                    rep = check_versioned_store(d, committer=mc)
                    issues.extend(f"{os.path.relpath(d, location)}: {i}"
                                  for i in rep["issues"])

    checked: set[str] = set()
    if mc.versioned:
        _walk(location, 0)
    else:
        info["partitions"] = sum(
            1 for _ in fs.walk_files(location) if _.endswith(".parquet")
        )
    report["healthy"] = not issues
    return report


def _parquet_column_values(fs, directory: str, column: str, issues: list):
    """All values of ``column`` across a parquet directory, via pyarrow —
    no Spark session. Returns ``None`` (check skipped) when the binding
    is not local-file-backed or pyarrow is unavailable; raises nothing:
    a corrupt/truncated file (exactly the crashed-write damage the doctor
    exists to diagnose) becomes an ISSUE entry, never a traceback."""
    from ..sinks.fs import LocalFS  # noqa: PLC0415

    if not isinstance(fs, LocalFS):
        return None
    try:
        import pyarrow.parquet as pq  # noqa: PLC0415
    except ImportError:
        return None
    values = []
    for f in sorted(fs.walk_files(directory, ".parquet")):
        try:
            values.extend(
                pq.read_table(f, columns=[column])[column].to_pylist()
            )
        except Exception as exc:  # noqa: BLE001 — diagnostic tool: report, don't crash
            issues.append(
                f"unreadable parquet {os.path.basename(f)!r} in "
                f"{os.path.basename(directory)!r} ({type(exc).__name__}: "
                f"{str(exc)[:120]}) — truncated/corrupt write?"
            )
            return None
    return values


def check_ann_index(path: str, fs=None) -> dict:
    """Doctor a saved ANN index directory (see
    :func:`~.similarity.build_ivf_index` / ``build_ivfpq_index``):

    - centroids must exist; the ``cells`` partition layout must be
      consistent with the detected kind (``cid=`` for IVF, ``cell=`` for
      IVF-PQ — a MIX corrupts partition discovery for every query, the
      exact failure ``saved_index_kind`` routing exists to prevent);
      every cell holds only ``batch_id=`` subdirs;
    - ORPHAN cells: a cell partition whose id has no trained centroid
      (nothing can ever probe it — its vectors are unreachable by every
      query, the silent-recall-loss failure);
    - EMPTY cell partitions: ``ann_index_delete`` removes directories it
      empties, so a dataless cell/batch dir is crashed-delete residue
      (harmless to reads, flagged for cleanup);
    - meta/kind drift: a ``meta`` sidecar on a codebook-less index (meta
      belongs to IVF-PQ), or a codebooks/centroids/meta directory with
      no parquet data inside.

    Filesystem + pyarrow only — no Spark session; the centroid-set checks
    are skipped (and say so) on non-local bindings."""
    from ..sinks.fs import LocalFS  # noqa: PLC0415

    fs = fs or LocalFS()
    issues: list[str] = []
    info: dict = {}
    report = {"path": path, "kind": "ann_index", "issues": issues, "info": info}
    if not fs.isdir(path):
        issues.append("index dir does not exist")
        report["healthy"] = False
        return report
    if not fs.isdir(os.path.join(path, "centroids")):
        issues.append("no centroids directory — not a saved ANN index")
        report["healthy"] = False
        return report
    has_codebooks = fs.isdir(os.path.join(path, "codebooks"))
    kind = "ivfpq" if has_codebooks else "ivf"
    info["index_kind"] = kind
    for artifact in ("centroids", "codebooks", "meta"):
        d = os.path.join(path, artifact)
        if fs.isdir(d) and not fs.walk_files(d, ".parquet"):
            issues.append(f"{artifact} directory holds no parquet data")
    if kind == "ivf" and fs.isdir(os.path.join(path, "meta")):
        issues.append(
            "meta sidecar present on a codebook-less index — meta belongs "
            "to IVF-PQ (kind drift: were the codebooks deleted, or the "
            "meta written into the wrong index?)"
        )
    n_issues_before = len(issues)
    cids = _parquet_column_values(
        fs, os.path.join(path, "centroids"), "cid", issues
    )
    if cids is None:
        # label the skip with its actual cause: an unreadable file already
        # appended its own issue; otherwise it was the environment
        info["centroid_check"] = (
            "skipped (unreadable centroids parquet — see issues)"
            if len(issues) > n_issues_before
            else "skipped (non-local fs or no pyarrow)"
        )
    else:
        info["n_centroids"] = len(cids)
        if len(set(cids)) != len(cids):
            issues.append("duplicate cid values in centroids")
    cells = os.path.join(path, "cells")
    if not fs.isdir(cells):
        info["cells"] = 0
        report["healthy"] = not issues
        return report
    expect = "cell=" if kind == "ivfpq" else "cid="
    other = "cid=" if kind == "ivfpq" else "cell="
    cid_set = None if cids is None else set(cids)
    if cid_set is not None and not cid_set:
        # an empty centroid set has exactly one root cause (the "holds no
        # parquet data" issue already appended above); flagging every cell
        # as an orphan would fan that single issue out per-cell
        info["orphan_check"] = "skipped: no centroid data"
        cid_set = None
    n_cells, empty_cells = 0, []
    for n in sorted(fs.listdir(cells)):
        full = os.path.join(cells, n)
        if not fs.isdir(full):
            # _SUCCESS and .…crc are Spark's own write artifacts
            if not n.startswith(("_", ".")):
                issues.append(f"stray file {n!r} at the cells root")
            continue
        if n.startswith(other):
            issues.append(
                f"cell dir {n!r} uses the {other[:-1]!r} convention inside "
                f"a {kind} index — mixed layouts break partition discovery "
                "for every query (was an upsert routed by a user flag "
                "instead of saved_index_kind?)"
            )
            continue
        if not n.startswith(expect):
            issues.append(f"unexpected cells subdirectory {n!r}")
            continue
        n_cells += 1
        if cid_set is not None:
            try:
                cell_id = int(n.split("=", 1)[1])
            except ValueError:
                cell_id = None
            if cell_id is not None and cell_id not in cid_set:
                issues.append(
                    f"orphan cell {n!r}: no trained centroid has this id — "
                    "its vectors are unreachable by every probe (centroids "
                    "overwritten after cells were written?)"
                )
        # ONE recursive walk per cell; emptiness of the cell and of each
        # batch subdir derives from it, and the layout check runs even on
        # an empty cell (an empty cell holding only a foreign subdir is a
        # layout violation, not just delete residue)
        cell_files = fs.walk_files(full, ".parquet")
        # membership is decided on the "<cell>/<batch>/" path-SEGMENT pair,
        # not an absolute-path prefix: fsspec backends return normalized
        # (protocol/root-stripped) keys from find(), so startswith against
        # the os.path.join'd absolute dir would falsely flag every
        # populated batch as empty on object-store bindings
        normalized = [f.replace(os.sep, "/") for f in cell_files]
        had_batch_residue = False
        for b in fs.listdir(full):
            sub = os.path.join(full, b)
            if fs.isdir(sub):
                if not b.startswith("batch_id="):
                    issues.append(f"cell {n}: non-batch subdirectory {b!r}")
                elif not any(f"/{n}/{b}/" in f"/{f}" for f in normalized):
                    empty_cells.append(f"{n}/{b}")
                    had_batch_residue = True
        if not cell_files and not had_batch_residue:
            empty_cells.append(n)
    if empty_cells:
        issues.append(
            f"{len(empty_cells)} empty cell partition(s) "
            f"({', '.join(empty_cells[:5])}"
            f"{', …' if len(empty_cells) > 5 else ''}) — ann_index_delete "
            "removes directories it empties, so this is crashed-delete "
            "residue; remove the empty dirs"
        )
    info["cells"] = n_cells
    report["healthy"] = not issues
    return report


def check_rtbf_log(log_dir: str, fs=None) -> dict:
    """Doctor the right-to-be-forgotten audit log
    (:func:`~.rtbf.rtbf_delete`): every record must parse and carry the
    request fields; an INCOMPLETE request (a crashed run that never
    resumed) is the one state a compliance review must not miss — it
    means some artifacts may still hold the documents. Incomplete
    requests are issues (the log's whole purpose is proving completion);
    resumed-count floors are info."""
    from ..sinks.fs import LocalFS  # noqa: PLC0415

    fs = fs or LocalFS()
    issues: list[str] = []
    info: dict = {}
    report = {"path": log_dir, "kind": "rtbf_log", "issues": issues, "info": info}
    if not fs.isdir(log_dir):
        issues.append("log dir does not exist")
        report["healthy"] = False
        return report
    total, incomplete, resumed = 0, [], 0
    for name in sorted(fs.listdir(log_dir)):
        if not name.endswith(".json"):
            continue
        total += 1
        try:
            rec = json.loads(fs.read(os.path.join(log_dir, name)))
        except ValueError:
            issues.append(f"record {name} is not valid JSON")
            continue
        # shape violations are ISSUES, never crashes: a diagnostic tool
        # for damaged logs must report the damage (a record of 'null' or
        # with artifacts=null is valid JSON but not a request record)
        if not isinstance(rec, dict):
            issues.append(f"record {name} is not a JSON object")
            continue
        missing = {"request_id", "n_ids", "artifacts", "completed"} - set(rec)
        if missing:
            issues.append(f"record {name} lacks fields {sorted(missing)}")
            continue
        if not isinstance(rec["artifacts"], dict):
            issues.append(f"record {name} has a non-object artifacts field")
            continue
        if not rec["completed"]:
            incomplete.append(rec["request_id"])
        resumed += sum(
            1
            for a in rec["artifacts"].values()
            if isinstance(a, dict) and a.get("resumed")
        )
    info["requests"] = total
    if resumed:
        info["resumed_artifact_counts"] = resumed
    if incomplete:
        info["incomplete_requests"] = incomplete
        issues.append(
            f"{len(incomplete)} request(s) never completed — some "
            "artifacts may still hold the documents; re-run rtbf with the "
            "same ids to resume"
        )
    report["healthy"] = not issues
    return report


def check_batch_output(out_dir: str, fs=None) -> dict:
    """Doctor a batch-id-addressed output dir: every subdirectory must be
    a parseable ``batch_id=N``; flats and the negative-token bases are
    reported; an unparseable token is an issue (partition discovery would
    fail for every consumer)."""
    from ..sinks.fs import LocalFS  # noqa: PLC0415

    fs = fs or LocalFS()
    issues: list[str] = []
    info: dict = {}
    report = {"path": out_dir, "kind": "batch_output", "issues": issues, "info": info}
    if not fs.isdir(out_dir):
        issues.append("output dir does not exist")
        report["healthy"] = False
        return report
    names = fs.listdir(out_dir)
    batches, bases, flats = 0, 0, 0
    pending_sweeps, crashed_folds = 0, 0
    for n in names:
        full = os.path.join(out_dir, n)
        if fs.isdir(full):
            if not n.startswith("batch_id="):
                issues.append(
                    f"unexpected subdirectory {n!r} (breaks batch_id "
                    "partition discovery)"
                )
                continue
            from .pipeline import (  # noqa: PLC0415
                RETRACT_COMMITTED,
                RETRACT_MARKER,
                _batch_token,
            )

            token = _batch_token(n)
            if token is None:
                issues.append(f"unparseable batch token {n!r}")
                continue
            if token < 0:
                bases += 1
                # a retraction fold's recovery state (benign: the next
                # retract_from_output sweeps it; reported so an operator
                # knows victims/duplicates are still transiently visible)
                marker = os.path.join(full, RETRACT_MARKER)
                if fs.exists(marker):
                    if not fs.exists(os.path.join(full, RETRACT_COMMITTED)):
                        crashed_folds += 1
                    elif any(
                        fs.exists(os.path.join(out_dir, e))
                        for e in fs.read(marker).splitlines()
                        if e
                    ):
                        pending_sweeps += 1
            else:
                batches += 1
        elif n.endswith(".parquet"):
            flats += 1
    info.update(
        {"live_batches": batches, "compacted_bases": bases, "legacy_flats": flats}
    )
    hints = []
    if flats:
        hints.append("legacy flat files fold into a base via output-compact")
    if crashed_folds:
        info["crashed_retraction_folds"] = crashed_folds
        hints.append(
            "a retraction died mid-write (its victims are still visible); "
            "re-run output-retract to discard the partial base and finish"
        )
    if pending_sweeps:
        info["pending_retraction_sweeps"] = pending_sweeps
        hints.append(
            "a committed retraction's source removal was interrupted "
            "(victims + survivor duplicates transiently visible); re-run "
            "output-retract to finish the sweep"
        )
    if hints:
        info["hint"] = "; ".join(hints)
    report["healthy"] = not issues
    return report
