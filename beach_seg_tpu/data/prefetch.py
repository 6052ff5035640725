"""Host↔device pipelining (SURVEY.md §7 "host/device pipeline").

The reference's geo setup is minutes of GDAL work executed serially before any
compute (tqdm loop at /root/reference/src/data.py:166-168) and its DataLoader
workers feed a CPU model. Here the host side runs in background threads so
TPU compute overlaps with (a) per-date mosaic construction and (b) batch
assembly:

  - ``prefetch_iterator``: wraps any iterator, keeping ``depth`` items ready
    in a background thread (covers crop/resize batch assembly).
  - ``MosaicPrefetcher``: builds per-date mosaics ``ahead`` dates in advance
    on a worker pool, so the accumulator for date N streams tiles while date
    N+1's reproject/merge runs on host CPUs.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from pathlib import Path
from typing import Any, Callable, Iterable, Iterator


def prefetch_iterator(it: Iterable, depth: int = 2) -> Iterator:
    """Background-thread prefetch of any iterator (exceptions re-raised)."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # propagate into the consumer
            q.put(("__error__", e))
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] == "__error__":
            raise item[1]
        yield item


class MosaicPrefetcher:
    """Schedules ``merge_tifs`` for upcoming dates on a thread pool."""

    def __init__(
        self,
        date_paths: list[tuple[str, list[Path]]],
        merge_fn: Callable[[list[Path]], Any],
        ahead: int = 2,
        workers: int = 2,
    ):
        self.date_paths = date_paths
        self.merge_fn = merge_fn
        self.ahead = max(1, ahead)
        self.pool = ThreadPoolExecutor(max_workers=workers)
        self.futures: dict[str, Future] = {}

    def _schedule(self, idx: int) -> None:
        if idx >= len(self.date_paths):
            return
        date, paths = self.date_paths[idx]
        if date not in self.futures:
            self.futures[date] = self.pool.submit(self.merge_fn, paths)

    def __iter__(self) -> Iterator[tuple[str, Any]]:
        for i in range(min(self.ahead, len(self.date_paths))):
            self._schedule(i)
        for i, (date, _) in enumerate(self.date_paths):
            self._schedule(i + self.ahead)
            yield date, self.futures.pop(date).result()
        self.pool.shutdown(wait=False)
