"""Overlap independent Spark actions from driver threads (guide §2.6).

Spark's scheduler runs several jobs at once inside one application;
actions are only sequential because driver code calls them sequentially.
The lifecycle compositions here chain many SMALL independent actions
(store builds, per-store erases, report counts) whose cost is dominated
by per-action latency — scheduling, planning, the py4j round trip — not
executor throughput, so running them from a small pool lets the next
action's tasks back-fill the current one's tail. FIFO scheduling keeps
the back-fill behaviour; 2–4 in flight is plenty.

Only INDEPENDENT work goes through here: actions on disjoint paths or
read-only actions. Protocol chains (OCC commits on one log) stay
sequential — their order IS the semantics.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from concurrent.futures import ThreadPoolExecutor
from typing import TypeVar

T = TypeVar("T")


def run_overlapped(thunks: Sequence[Callable[[], T]], max_workers: int = 4) -> list[T]:
    """Run independent zero-arg callables concurrently; results in order.

    The first raised exception propagates (after the pool drains), same
    as the sequential loop it replaces. With one thunk the pool is
    skipped entirely.
    """
    if not thunks:
        return []
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=min(max_workers, len(thunks))) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]
