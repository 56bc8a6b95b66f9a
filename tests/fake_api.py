"""Deterministic in-process fake SRI API for tests.

Mirrors the reference's express fixture (``/root/reference/test/index.mjs:
40-77``): a paginated collection with $$meta.next links, tombstone feed,
modifiedSince / keyIn / expand handling, and mutation helpers for the delta /
safe-delta scenarios in FIXTURES.md §5. Exposes ``fetch_json(url)`` so the
reader needs no HTTP server.
"""

from __future__ import annotations

import datetime as dt
import urllib.parse

_BASE = dt.datetime(2019, 7, 16, 7, 0, 0, tzinfo=dt.timezone.utc)


def seq_ts(i: int) -> str:
    """Valid, strictly increasing ISO timestamp for any index."""
    return (_BASE + dt.timedelta(seconds=i)).strftime("%Y-%m-%dT%H:%M:%S.000Z")


def make_resource(path: str, i: int, modified: str, name: str | None = None) -> dict:
    return {
        "$$meta": {
            "type": "_" + path.strip("/").upper(),
            "permalink": f"{path}/{i}",
            "modified": modified,
            "deleted": False,
        },
        "key": str(i),
        "name": name or f"Name of resource {path}",
    }


class FakeSriApi:
    def __init__(self, path: str = "/a", n: int = 10, page_size: int = 3) -> None:
        self.path = path
        self.page_size = page_size
        self.resources: dict[str, dict] = {}
        self.deleted: dict[str, str] = {}  # href -> modified (tombstones)
        self.filters: dict[str, str] = {}  # attribute filters, e.g. {"gender": "F"}
        self.request_log: list[str] = []
        self.broken_next_links = False
        for i in range(1, n + 1):
            r = make_resource(path, i, seq_ts(60 * i))
            self.resources[r["$$meta"]["permalink"]] = r

    # -- mutation helpers (delta scenarios) ---------------------------------

    def update(self, i: int, modified: str, name: str | None = None) -> None:
        href = f"{self.path}/{i}"
        r = dict(self.resources[href])
        r["$$meta"] = dict(r["$$meta"], modified=modified)
        if name is not None:
            r["name"] = name
        self.resources[href] = r

    def touch_without_change(self, i: int, modified: str) -> None:
        """Same payload semantics the reference skips via null-aware <>: only
        $$meta.modified changes, document otherwise identical."""
        self.update(i, modified)

    def delete(self, i: int, modified: str) -> None:
        href = f"{self.path}/{i}"
        self.resources.pop(href, None)
        self.deleted[href] = modified

    def drop_silently(self, i: int) -> None:
        """Membership exit without a tombstone (safe-delta scenario)."""
        self.resources.pop(f"{self.path}/{i}", None)

    def add(self, i: int, modified: str) -> None:
        r = make_resource(self.path, i, modified)
        href = r["$$meta"]["permalink"]
        self.resources[href] = r
        # a recreated resource no longer appears in the deleted feed
        self.deleted.pop(href, None)

    # -- request handling ----------------------------------------------------

    def fetch_json(self, url: str) -> dict:
        self.request_log.append(url)
        parsed = urllib.parse.urlparse(url)
        q = dict(urllib.parse.parse_qsl(parsed.query, keep_blank_values=True))
        limit_raw = q.get("limit", "500")
        offset = int(q.get("offset", "0"))
        expand = q.get("expand", "FULL")
        want_deleted = q.get("$$meta.deleted") == "true"
        modified_since = q.get("modifiedSince")
        key_in = q.get("keyIn")

        if want_deleted:
            items = [
                (href, {"$$meta": {"permalink": href, "modified": m, "deleted": True}})
                for href, m in sorted(self.deleted.items())
            ]
            if modified_since:
                items = [(h, r) for h, r in items if r["$$meta"]["modified"] > modified_since]
        else:
            items = sorted(self.resources.items())
            if modified_since:
                items = [
                    (h, r) for h, r in items if r["$$meta"]["modified"] > modified_since
                ]
            if key_in:
                keys = set(key_in.split(","))
                items = [(h, r) for h, r in items if r.get("key") in keys]

        limit = len(items) if limit_raw == "*" else min(int(limit_raw), self.page_size)
        page = items[offset : offset + limit]
        results = []
        for href, r in page:
            if expand == "NONE":
                results.append({"href": href})
            else:
                results.append({"href": href, "$$expanded": r})

        meta: dict = {"current": url, "count": len(items)}
        if offset + limit < len(items) and not self.broken_next_links:
            nxt_q = dict(q, offset=str(offset + limit))
            meta["next"] = f"{parsed.path}?{urllib.parse.urlencode(nxt_q)}"
        return {"$$meta": meta, "results": results}
