"""Paged SRI REST source (SURVEY §2.A, A1-A7).

An SRI collection is paginated via ``$$meta.next`` links — inherently a
sequential scan — so the reader runs on the driver with a 1-deep prefetch
thread (the reference's pipelining, ``src/lib/client.js:1506``) and
materializes pages into Arrow-backed DataFrames in fixed-size batches.

Pushdown is part of the source, exactly as in the reference:
- predicate pushdown: ``modifiedSince`` (client.js:1684-1687), tombstone scan
  ``$$meta.deleted=true`` (client.js:1688-1693), user filters in the path;
- projection pushdown: ``expand=FULL|NONE`` (utils.js:74-80).

Scale path: when the API supports offset addressing (the reference's
``nextLinksBroken`` mode, client.js:1498-1501), ``read_offset_sharded``
distributes disjoint offset ranges across executors with ``mapInPandas`` —
that is the 1000-executor ingest strategy; next-link following stays the
sequential-fidelity default.

The HTTP transport is injectable (``fetch_json``) so tests run a deterministic
in-process fake API; the default transport uses urllib with retry
(reference delegates retry to sri-client, README.md:85-90).
"""

from __future__ import annotations

import json
import re
import threading
import time
import urllib.parse
import urllib.request
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("href", T.StringType(), True),
        T.StructField("resource", T.StringType(), True),
    ]
)

DEFAULT_LIMIT = 500  # reference default page size, client.js:1678/1486
KEYIN_MAX_KEYS = 500  # client.js:1538-1542
KEYIN_MAX_URL = 2048


def set_expand_on_path(path: str, expansion: str) -> str:
    """A6 — force an ``expand=`` parameter on a path (utils.js:74-80)."""
    if re.search(r"expand=[^&]*", path):
        return re.sub(r"expand=[^&]*", f"expand={expansion}", path)
    sep = "&" if "?" in path else "?"
    return f"{path}{sep}expand={expansion}"


def strip_query(path: str) -> str:
    """Path without user filters — tombstone scans must see deletions globally
    (client.js:1688-1693 deliberately strips filters)."""
    return path.split("?", 1)[0]


def default_fetch_json(
    url: str, timeout: float = 60.0, retries: int = 3, initial_wait: float = 0.5
) -> dict:
    """GET url → parsed JSON with exponential-backoff retry (README.md:85-90)."""
    return make_fetch_json(timeout=timeout, retries=retries, initial_wait=initial_wait)(
        url
    )


def make_fetch_json(
    username: str | None = None,
    password: str | None = None,
    headers: dict[str, str] | None = None,
    timeout: float = 60.0,
    retries: int = 3,
    initial_wait: float = 0.5,
    factor: float = 2.0,
):
    """Transport factory mirroring the reference's api config surface
    (README.md:80-90 / sri-client generic interface): HTTP Basic auth from
    ``username``/``password``, extra request ``headers``, and the
    ``timeout`` / ``retry: {retries, initialWait, factor}`` knobs. Returns a
    ``fetch_json(url) -> dict`` suitable for ``SriApiReader``."""
    import base64  # noqa: PLC0415

    hdrs = dict(headers or {})
    if username is not None:
        token = base64.b64encode(f"{username}:{password or ''}".encode()).decode()
        hdrs["Authorization"] = f"Basic {token}"

    def fetch(url: str) -> dict:
        wait = initial_wait
        for attempt in range(retries + 1):
            try:
                req = urllib.request.Request(url, headers=hdrs)
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    return json.loads(resp.read().decode("utf-8"))
            except Exception:
                if attempt == retries:
                    raise
                time.sleep(wait)
                wait *= factor
        raise RuntimeError("unreachable")

    return fetch


def translate_page(payload) -> list[tuple[str | None, str | None]]:
    """B1 — normalize any SRI response shape into (href, raw_json) pairs
    (utils.js:149-169): {results:[{href, $$expanded}]} | plain array of
    resources | array of href strings."""
    if isinstance(payload, dict) and "results" in payload:
        out = []
        for r in payload["results"]:
            if isinstance(r, str):
                out.append((r, None))
                continue
            href = r.get("href")
            doc = r.get("$$expanded")
            if doc is None and "href" not in r and r:
                doc = r  # bare resource in results
            if doc is None:
                out.append((href, None))  # expand=NONE entry (client.js:322-332)
            else:
                if href is None:
                    href = (doc.get("$$meta") or {}).get("permalink")
                out.append((href, json.dumps(doc, separators=(",", ":"), sort_keys=True)))
        return out
    if isinstance(payload, list):
        out = []
        for r in payload:
            if isinstance(r, str):
                out.append((r, None))
            else:
                href = (r.get("$$meta") or {}).get("permalink")
                out.append((href, json.dumps(r, separators=(",", ":"), sort_keys=True)))
        return out
    raise ValueError(f"unrecognized SRI response shape: {type(payload)}")


class SriApiReader:
    """Driver-paged reader for one SRI endpoint."""

    def __init__(
        self,
        spark: SparkSession,
        base_url: str,
        fetch_json: Callable[[str], dict] | None = None,
        limit: int = DEFAULT_LIMIT,
        next_links_broken: bool = False,
    ) -> None:
        self.spark = spark
        self.base_url = base_url.rstrip("/")
        self.fetch_json = fetch_json or default_fetch_json
        self.limit = limit
        self.next_links_broken = next_links_broken

    # -- paging ------------------------------------------------------------

    def _full_url(self, path_or_url: str) -> str:
        if path_or_url.startswith("http"):
            return path_or_url
        return self.base_url + path_or_url

    def probe_count(self, path: str) -> int | None:
        """Cheap collection-size probe: fetch one row and read
        ``$$meta.count`` (SRI servers report the filtered total unless count
        is disabled). Returns None when the server doesn't expose it — the
        caller must fall back to sequential next-link paging."""
        sep = "&" if "?" in path else "?"
        payload = self.fetch_json(self._full_url(f"{path}{sep}limit=1"))
        if isinstance(payload, dict):
            c = (payload.get("$$meta") or {}).get("count")
            if isinstance(c, int):
                return c
        return None

    def iter_pages(self, path: str) -> Iterator[list[tuple[str | None, str | None]]]:
        """A1/A2 — follow $$meta.next with a 1-deep prefetch thread
        (client.js:1485-1522; prefetch at :1506; broken-links fallback
        :1498-1501)."""
        url: str | None = self._full_url(path)
        offset = 0

        def fetch(u: str) -> dict:
            return self.fetch_json(u)

        pending: threading.Thread | None = None
        box: dict = {}

        def start_prefetch(u: str) -> threading.Thread:
            def run() -> None:
                try:
                    box["payload"] = fetch(u)
                except Exception as e:  # surfaced on join
                    box["error"] = e

            t = threading.Thread(target=run, daemon=True)
            t.start()
            return t

        pending = start_prefetch(url)
        while url is not None:
            pending.join()
            if "error" in box:
                raise box.pop("error")
            payload = box.pop("payload")
            rows = translate_page(payload)
            offset += len(rows)
            nxt = None
            if isinstance(payload, dict):
                nxt = (payload.get("$$meta") or {}).get("next")
            if nxt is None and self.next_links_broken and len(rows) >= self.limit:
                # A2: synthesize next page by offset when links are unreliable
                base = re.sub(r"[&?]offset=\d+", "", self._full_url(path))
                sep = "&" if "?" in base else "?"
                nxt = f"{base}{sep}offset={offset}"
            url = self._full_url(nxt) if nxt else None
            if url is not None:
                pending = start_prefetch(url)
            yield rows

    def read_collection(
        self,
        path: str,
        modified_since: str | None = None,
        expand: str = "FULL",
        deleted: bool = False,
        rows_per_batch: int = 100_000,
    ) -> DataFrame:
        """Scan a collection into a DataFrame of (href, resource).

        Pushdown goes into the URL: ``limit`` (page size), ``modifiedSince``
        (A4), ``$$meta.deleted=true`` + stripped filters (A5), ``expand`` (A6).
        Pages accumulate into createDataFrame batches of ``rows_per_batch`` to
        bound driver memory, then union (Catalyst folds the unions into one
        scan of localtable batches).
        """
        p = strip_query(path) if deleted else path
        sep = "&" if "?" in p else "?"
        url = f"{p}{sep}limit={self.limit}"
        if deleted:
            url += "&$$meta.deleted=true"
        if modified_since:
            url += f"&modifiedSince={urllib.parse.quote(modified_since)}"
        url = set_expand_on_path(url, expand)

        batches: list[DataFrame] = []
        buf: list[tuple[str | None, str | None]] = []
        for page in self.iter_pages(url):
            buf.extend(page)
            if len(buf) >= rows_per_batch:
                batches.append(self._page_batch_df(buf))
                buf = []
        if buf or not batches:
            batches.append(self._page_batch_df(buf))
        df = batches[0]
        for b in batches[1:]:
            df = df.unionByName(b)
        return df

    def _page_batch_df(self, buf: list[tuple[str | None, str | None]]) -> DataFrame:
        """One driver-accumulated page batch → DataFrame.

        Deliberately the PICKLED-LIST construction, not ``localframe``'s
        Arrow ``LocalRelation``: a LocalRelation invites the optimizer's
        ``ConvertToLocalRelation`` rule to evaluate every downstream
        deterministic projection EAGERLY ON THE DRIVER at plan time — for a
        100k-row page batch that folds the whole staging chain (from_json
        envelope parse and all) into a single-threaded driver pass, re-run
        on every action that embeds the feed (measured: +4-5 s per
        200k-row delta merge, the dominant regression of the r12 delta
        bench). The pickled-RDD scan keeps staging distributed; measured
        end-to-end (construct + stage + noop, 200k rows, local[32]):
        list 2.0-2.7 s vs plain Arrow LocalRelation 4.7-5.2 s vs
        Arrow + repartition barrier 2.7-3.4 s. ``localframe.local_df``
        remains the right construction for the engine's tiny CONTROL
        frames (watermark rows, id lists), where no corpus-sized
        expression can fold into the driver."""
        if not buf:
            from ..localframe import empty_df  # noqa: PLC0415

            return empty_df(self.spark, PAGE_SCHEMA)
        return self.spark.createDataFrame(buf, PAGE_SCHEMA)

    # -- point lookups -------------------------------------------------------

    def get_all_hrefs(self, path: str, hrefs: list[str]) -> DataFrame:
        """A3 — batched keyIn point lookups (client.js:1524-1577): batches of
        ≤500 keys and ≤2048 URL chars, with the same 1-page prefetch."""
        base = strip_query(path)
        keys = [h.rsplit("/", 1)[-1] for h in hrefs]
        batches: list[list[str]] = []
        cur: list[str] = []
        cur_len = len(self._full_url(base)) + len("?keyIn=")
        for k in keys:
            if cur and (len(cur) >= KEYIN_MAX_KEYS or cur_len + len(k) + 1 > KEYIN_MAX_URL):
                batches.append(cur)
                cur, cur_len = [], len(self._full_url(base)) + len("?keyIn=")
            cur.append(k)
            cur_len += len(k) + 1
        if cur:
            batches.append(cur)

        rows: list[tuple[str | None, str | None]] = []
        for batch in batches:
            url = f"{base}?keyIn={','.join(batch)}&limit={max(self.limit, len(batch))}"
            url = set_expand_on_path(url, "FULL")
            for page in self.iter_pages(url):
                rows.extend(page)
        # same construction as read_collection's batches: a keyIn gap fetch
        # can return an unbounded page list, and the LocalRelation fold
        # hazard (see _page_batch_df) applies to its staging too
        return self._page_batch_df(rows)

    def get_hrefs_distributed(self, path: str, hrefs_df: DataFrame) -> DataFrame:
        """A3 at scale — executor-side keyIn fetch of an unbounded gap list.

        The driver-side ``get_all_hrefs`` materializes the full href list on
        the driver; after an outage on a very large collection the safe-delta
        gap list is unbounded, so this variant keeps it distributed: each
        executor task batches its own partition of hrefs into keyIn groups
        (same ≤500-key / ≤2048-char limits, client.js:1524-1577) and fetches
        them with Arrow batching. Nothing but per-batch pages ever
        materializes in one process.
        """
        import pandas as pd  # noqa: PLC0415

        fetch = self.fetch_json
        base_root = self.base_url
        base = strip_query(path)
        base_len = len(self._full_url(base)) + len("?keyIn=")
        limit = self.limit

        def run(iterator):
            def flush(keys: list[str]):
                url = base_root + base + f"?keyIn={','.join(keys)}&limit={max(limit, len(keys))}"
                url = set_expand_on_path(url, "FULL")
                rows: list[tuple[str | None, str | None]] = []
                u: str | None = url
                while u is not None:
                    payload = fetch(u)
                    rows.extend(translate_page(payload))
                    nxt = None
                    if isinstance(payload, dict):
                        nxt = (payload.get("$$meta") or {}).get("next")
                    u = None if nxt is None else (nxt if nxt.startswith("http") else base_root + nxt)
                return pd.DataFrame(rows, columns=["href", "resource"])

            cur: list[str] = []
            cur_len = base_len
            for pdf in iterator:
                for href in pdf.iloc[:, 0]:
                    k = str(href).rsplit("/", 1)[-1]
                    if cur and (
                        len(cur) >= KEYIN_MAX_KEYS or cur_len + len(k) + 1 > KEYIN_MAX_URL
                    ):
                        yield flush(cur)
                        cur, cur_len = [], base_len
                    cur.append(k)
                    cur_len += len(k) + 1
            if cur:
                yield flush(cur)

        return hrefs_df.mapInPandas(run, PAGE_SCHEMA)

    # -- scale path ----------------------------------------------------------

    def read_offset_sharded(
        self,
        path: str,
        total_count: int,
        shard_size: int = 10_000,
        expand: str = "FULL",
    ) -> DataFrame:
        """Distributed offset-range scan for offset-addressable APIs.

        Each executor task owns a disjoint [offset, offset+shard_size) range
        and pages through it independently — the 100 TB ingest path. Uses
        mapInPandas so fetching happens executor-side with Arrow batching;
        the fetch callable must be picklable (the default urllib one is).
        """
        import pandas as pd  # noqa: PLC0415

        fetch = self.fetch_json
        base = set_expand_on_path(self._full_url(path), expand)
        limit = self.limit
        offsets = list(range(0, total_count, shard_size))
        from ..localframe import local_df  # noqa: PLC0415

        sdf = local_df(
            self.spark,
            [(o,) for o in offsets],
            T.StructType([T.StructField("offset", T.LongType())]),
        ).repartition(max(1, len(offsets)))

        def run(iterator):
            for pdf in iterator:
                for off in pdf["offset"]:
                    got = 0
                    while got < shard_size:
                        page_limit = min(limit, shard_size - got)
                        sep = "&" if "?" in base else "?"
                        url = f"{base}{sep}limit={page_limit}&offset={int(off) + got}"
                        rows = translate_page(fetch(url))
                        if not rows:
                            break
                        got += len(rows)
                        yield pd.DataFrame(rows, columns=["href", "resource"])
                        if len(rows) < page_limit:
                            break

        return sdf.mapInPandas(run, PAGE_SCHEMA)
