"""Multi-endpoint orchestration (SURVEY D5) + RFC-7386 config merge (B10).

The reference's ``Sri2DbMulti`` builds N clients from a base config plus
per-endpoint JSON-merge-patch overwrites and runs the same method on all with
bounded concurrency and settled-results semantics
(``src/lib/client.js:2094-2145``). Spark-side, endpoint syncs are independent
driver pipelines sharing one SparkSession; bounded concurrency maps to a
thread pool (Spark schedules the resulting jobs fairly across threads).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any

from .engine import Sri2DbSync, SyncResult


def merge_patch(base: Any, patch: Any) -> Any:
    """RFC 7386 JSON merge patch (reference uses the json-merge-patch package,
    client.js:2105): dict keys in ``patch`` overwrite/delete (None) keys in
    ``base`` recursively; any non-dict patch replaces wholesale."""
    if not isinstance(patch, dict):
        return patch
    result = dict(base) if isinstance(base, dict) else {}
    for k, v in patch.items():
        if v is None:
            result.pop(k, None)
        else:
            result[k] = merge_patch(result.get(k), v)
    return result


@dataclass
class Settled:
    """pSettle-shaped result (client.js:2124-2127, README.md:231-238)."""

    is_fulfilled: bool
    value: SyncResult | None = None
    reason: BaseException | None = None

    @property
    def is_rejected(self) -> bool:
        return not self.is_fulfilled


@dataclass
class Sri2DbMulti:
    """Run the same sync method across N endpoint clients with bounded
    concurrency (default 1, like the reference, client.js:2097)."""

    clients: list[Sri2DbSync]
    concurrency: int = 1

    def _run_all(self, method: str, *args) -> list[Settled]:
        def call(client: Sri2DbSync) -> SyncResult:
            return getattr(client, method)(*args)

        results: list[Settled] = []
        with ThreadPoolExecutor(max_workers=max(1, self.concurrency)) as pool:
            futures = [pool.submit(call, c) for c in self.clients]
            for f in futures:
                try:
                    results.append(Settled(True, value=f.result()))
                except BaseException as e:  # settled semantics: never raise
                    results.append(Settled(False, reason=e))
        return results

    def full_sync(self) -> list[Settled]:
        return self._run_all("full_sync")

    def delta_sync(self, modified_since: str | None = None) -> list[Settled]:
        return self._run_all("delta_sync", modified_since)

    def safe_delta_sync(self, modified_since: str | None = None) -> list[Settled]:
        return self._run_all("safe_delta_sync", modified_since)

    def configured_sync(self, synctype: str = "deltaSync") -> list[Settled]:
        return self._run_all("configured_sync", synctype)
