"""Deterministic demo factories for the Python DataSources.

Counterpart of the reference's synthetic example generators
(reference examples/concurrency_example.py builds mock LMS shards):
an importable sharded object generator and a fake paginated listing
API, used by the pysource tests and runnable as documentation. Real
deployments point the ``factory`` / ``fetch`` options at their own
``module:function`` instead.
"""

from __future__ import annotations

N_USERS = 37
PAGE_SIZE = 10
N_PAGES = 4


def make_users(partition_id: int, num_partitions: int):
    """Sharded Iterable[dict]: user ``i`` is emitted by partition
    ``i % num_partitions`` — disjoint and exhaustive across shards."""
    for i in range(N_USERS):
        if i % num_partitions == partition_id:
            yield {
                "id": i,
                "name": f"user{i}",
                "tags": [f"t{i % 3}"],
                "active": i % 2 == 0,
            }


def fetch_page(cursor: int):
    """Paginated listing: ``(rows, next_cursor)``; None ends the
    listing. Deterministic for any cursor — replayable on recovery."""
    if cursor >= N_PAGES:
        return [], None
    rows = [
        {"seq": cursor * PAGE_SIZE + j, "page": cursor}
        for j in range(PAGE_SIZE)
    ]
    nxt = cursor + 1 if cursor + 1 < N_PAGES else None
    return rows, nxt
