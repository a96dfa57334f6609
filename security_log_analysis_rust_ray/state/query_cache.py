"""TTL-bounded query-result cache — the reference's serving-layer
``TimedSizedCache`` (T3: 100 entries, 3600 s TTL, keyed on the query's
display string, /root/reference/src/security_log_http.rs:102-122,161-185)
as a library component over the aggregate queries.

The HTTP server itself stays out of scope (per SURVEY), but the cache
semantics are reference parity: size-bounded LRU eviction + per-entry TTL,
so repeated dashboard-style aggregate hits serve from memory instead of
re-running a distributed pipeline.  Results are stored as pandas frames
(aggregates are tiny by construction); the clock is injectable for tests.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from typing import Any, Callable

CACHE_SIZE = 100      # reference: TimedSizedCache::with_size_and_lifespan(100, 3600)
CACHE_TTL_S = 3600.0


class TTLCache:
    def __init__(self, max_size: int = CACHE_SIZE, ttl_s: float = CACHE_TTL_S,
                 clock: Callable[[], float] = time.monotonic):
        self.max_size = max_size
        self.ttl_s = ttl_s
        self.clock = clock
        self._d: OrderedDict[str, tuple[float, Any]] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get_or_compute(self, key: str, compute: Callable[[], Any]) -> Any:
        now = self.clock()
        hit = self._d.get(key)
        if hit is not None and now - hit[0] <= self.ttl_s:
            self._d.move_to_end(key)
            self.hits += 1
            return hit[1]
        self.misses += 1
        value = compute()
        self._d[key] = (now, value)
        self._d.move_to_end(key)
        while len(self._d) > self.max_size:
            self._d.popitem(last=False)  # LRU eviction
        return value

    def invalidate(self, key: str | None = None) -> None:
        if key is None:
            self._d.clear()
        else:
            self._d.pop(key, None)

    def __len__(self) -> int:
        return len(self._d)


_CACHE = TTLCache()


def cached_query(name: str, sf_dir: str, fn: Callable[[str], Any],
                 cache: TTLCache | None = None):
    """Serve ``fn(sf_dir)`` through the TTL cache (key = the reference's
    display-string pattern: query name + parameters).  The result is
    normalized to pandas so cached consumers never re-trigger Ray
    execution."""
    c = _CACHE if cache is None else cache  # NOT `or`: empty cache is falsy

    def compute():
        res = fn(sf_dir)
        return res.to_pandas() if hasattr(res, "to_pandas") else res

    return c.get_or_compute(f"{name}({sf_dir})", compute)
