"""Session-lifetime residual-cache registry.

Some operators must leave exactly one persisted frame alive when they
return a lazy result (the returned plan consumes it — e.g.
``spans.remove_duplicate_spans``' covered-word set, or
``dedup.tfidf_pairs``' posting table). Each such frame is recorded
here so long-lived sessions (a 140-query gate run, a notebook) can
reclaim them all in one call instead of accumulating one residual per
operator call. Releasing is always safe: a result consumed AFTER
release recomputes through its (uncached) lineage — slower, never
wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: One entry per operator call that returned while depending on a
#: persisted frame. Strong references on purpose — unpersist needs
#: the live object, and the storage blocks outlive the Python ref
#: anyway.
LIVE_CACHES: list[DataFrame] = []


def register_cache(df: DataFrame) -> DataFrame:
    """Record a persisted frame as a reclaimable residual."""
    LIVE_CACHES.append(df)
    return df


def release_caches() -> int:
    """Unpersist every recorded residual cache; returns how many."""
    n = len(LIVE_CACHES)
    for f in LIVE_CACHES:
        f.unpersist()
    LIVE_CACHES.clear()
    return n
