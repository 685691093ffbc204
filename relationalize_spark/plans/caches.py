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

Entries are keyed by an ``owner`` tag (the registering module) so a
scoped release — ``release_caches(owner="spans")`` — touches only
that module's residuals instead of deoptimizing every still-lazy
result in the session (r9 ADVICE: the span-scoped release name was
an alias for the session-wide release).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: One ``(owner, frame)`` entry per operator call that returned while
#: depending on a persisted frame. Strong references on purpose —
#: unpersist needs the live object, and the storage blocks outlive
#: the Python ref anyway.
LIVE_CACHES: list[tuple[str, DataFrame]] = []


def register_cache(df: DataFrame, owner: str = "session") -> DataFrame:
    """Record a persisted frame as a reclaimable residual owned by
    ``owner`` (the registering module's tag)."""
    LIVE_CACHES.append((owner, df))
    return df


def release_caches(owner: str | None = None) -> int:
    """Unpersist recorded residual caches and return how many.

    With ``owner`` given, only that owner's residuals are released;
    with ``None`` (default), everything is."""
    kept: list[tuple[str, DataFrame]] = []
    n = 0
    for o, f in LIVE_CACHES:
        if owner is None or o == owner:
            f.unpersist()
            n += 1
        else:
            kept.append((o, f))
    LIVE_CACHES[:] = kept
    return n
