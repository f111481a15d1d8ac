"""Threaded producer/consumer helper for host-IO / device-compute overlap.

The GIL is released inside cv2 decode/resize and numpy copies, so a single
producer thread loading batch N+1 genuinely overlaps the (async-dispatched)
device inference of batch N — turning an IO+compute pipeline from
host + device per batch into max(host, device).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, TypeVar

T = TypeVar("T")
U = TypeVar("U")


def threaded_map(fn: Callable[[T], U], items: Iterable[T],
                 depth: int = 2) -> Iterator[U]:
    """Yield ``fn(item)`` for each item, computed ``depth`` ahead in a
    background thread.  Exceptions in ``fn`` re-raise at the consumer."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)

    def producer():
        try:
            for item in items:
                q.put(("ok", fn(item)))
        except BaseException as e:  # noqa: BLE001 — surfaced to consumer
            q.put(("err", e))
            return
        q.put(("end", None))

    threading.Thread(target=producer, daemon=True).start()
    while True:
        kind, item = q.get()
        if kind == "err":
            raise item
        if kind == "end":
            return
        yield item
