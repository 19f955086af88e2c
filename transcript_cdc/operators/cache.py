"""LRU get-or-fetch (SURVEY.md §2.4 J9).

The reference keeps an OrderedDict LRU of query/vector entries
(search_server/src/repositories/vector_store.py:7-11,33-63) and its
correlations service tries the cache before point-looking-up the store
(search_server/src/services/correlations.py:64-78,104-107). In a
set-oriented engine the BULK answer is ``df.persist()`` (hot snapshots)
— but the reference's op is specifically the DRIVER-SIDE memo around
small point lookups that seed a plan (a query embedding, a source
document's text): each miss costs one tiny Spark job, each hit costs
nothing. This is that memo, with the same semantics: bounded capacity,
recency update on hit, evict-oldest on overflow.

Cache keys must capture snapshot identity (e.g. include the table epoch)
when the underlying data can change — the cache itself is deliberately
dumb and never invalidates.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from collections.abc import Callable, Hashable


class LruCache:
    """Thread-safe OrderedDict LRU with get-or-fetch, mirroring the
    reference's vector store (max 1000 entries there; configurable here).

    ``None`` values are cached too (a point lookup that found nothing is
    still an answer — the reference caches misses implicitly by storing
    whatever the fetch returned)."""

    _MISS = object()

    def __init__(self, maxsize: int = 1000):
        if maxsize < 1:
            raise ValueError("maxsize must be >= 1")
        self.maxsize = maxsize
        self.hits = 0
        self.misses = 0
        self._d: OrderedDict = OrderedDict()
        self._lock = threading.Lock()

    def get_or_fetch(self, key: Hashable, fetch: Callable[[], object]):
        with self._lock:
            v = self._d.get(key, self._MISS)
            if v is not self._MISS:
                self._d.move_to_end(key)
                self.hits += 1
                return v
        # fetch OUTSIDE the lock: it may run a Spark job; concurrent
        # misses on the same key fetch twice (harmless — last write wins),
        # never deadlock.
        value = fetch()
        with self._lock:
            self.misses += 1
            self._d[key] = value
            self._d.move_to_end(key)
            while len(self._d) > self.maxsize:
                self._d.popitem(last=False)  # evict least-recently-used
        return value

    def __len__(self) -> int:
        with self._lock:
            return len(self._d)

    def __contains__(self, key: Hashable) -> bool:
        with self._lock:
            return key in self._d
