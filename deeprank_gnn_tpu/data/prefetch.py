"""Background-thread device prefetcher.

Through the TPU tunnel a host->device transfer costs ~2 ms/MB, which
would serialize with the ~0.2 ms train step. `PrefetchIterator` runs
collation + `jax.device_put` in a worker thread with a small bounded
queue, so the accelerator consumes batch k while the host builds and
ships batch k+1 — the framework's data-loader/executor overlap (the
reference's torch DataLoader has no device-side prefetch at all).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax

_SENTINEL = object()


class PrefetchIterator:
    """Wrap a (batch, mols) iterable; yields device-resident batches."""

    def __init__(self, iterable: Iterable, size: int = 2, device=None):
        self._iterable = iterable
        self._size = size
        self._device = device

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self._size)
        err: list = []

        def worker():
            try:
                for batch, mols in self._iterable:
                    placed = (
                        jax.device_put(batch, self._device)
                        if self._device is not None
                        else jax.device_put(batch)
                    )
                    q.put((placed, mols))
            except Exception as exc:  # surface in the consumer thread
                err.append(exc)
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
        t.join()
        if err:
            raise err[0]


def prefetch(loader, size: int = 2, device=None) -> PrefetchIterator:
    return PrefetchIterator(loader, size=size, device=device)
