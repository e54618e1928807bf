"""Background-thread batch prefetcher (host -> device overlap).

The reference paid a synchronous feed_dict copy per step (SURVEY.md
§3.2); our device step is ~9k frustums/s while the single-core host
provider builds ~2k/s, so training is host-bound without overlap. This
iterator runs the provider in a daemon thread and keeps a small queue of
batches already transferred to the device, so host prep, H2D copy, and
the device step pipeline against each other.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

import jax


class PrefetchIterator:
    """Wrap a batch iterable; yields device-resident batches."""

    _DONE = object()

    def __init__(self, batches: Iterable, buffer_size: int = 3,
                 device_put: Optional[Callable[[Any], Any]] = None):
        self._q: queue.Queue = queue.Queue(maxsize=buffer_size)
        self._device_put = device_put or jax.device_put
        self._err: Optional[BaseException] = None

        def worker():
            try:
                for batch in batches:
                    self._q.put(self._device_put(batch))
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                self._q.put(self._DONE)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(batches: Iterable, buffer_size: int = 3,
             device_put: Optional[Callable[[Any], Any]] = None
             ) -> PrefetchIterator:
    return PrefetchIterator(batches, buffer_size, device_put)
