"""Background pipelined device prefetcher.

Through the TPU tunnel a host->device transfer costs ~2 ms/MB, which
would serialize with the ~0.2 ms train step. `PrefetchIterator` runs a
two-stage pipeline on separate threads — stage 1 collates batches on
the host (numpy assembly from the loader's cached plans), stage 2 ships
them with `jax.device_put` — so the accelerator consumes batch k while
batch k+1 is in flight and batch k+2 is being collated. (The
reference's torch DataLoader has no device-side prefetch at all;
collation, H2D copy and compute fully serialize per batch,
reference `NeuralNet.py:490-493`.)
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
        host_q: queue.Queue = queue.Queue(maxsize=self._size)
        dev_q: queue.Queue = queue.Queue(maxsize=self._size)
        err: list = []

        def collator():
            try:
                for item in self._iterable:
                    host_q.put(item)
            except Exception as exc:  # surface in the consumer thread
                err.append(exc)
            finally:
                host_q.put(_SENTINEL)

        def shipper():
            try:
                while True:
                    item = host_q.get()
                    if item is _SENTINEL:
                        break
                    batch, mols = item
                    placed = (
                        jax.device_put(batch, self._device)
                        if self._device is not None
                        else jax.device_put(batch)
                    )
                    dev_q.put((placed, mols))
            except Exception as exc:
                err.append(exc)
            finally:
                dev_q.put(_SENTINEL)

        threads = [
            threading.Thread(target=collator, daemon=True),
            threading.Thread(target=shipper, daemon=True),
        ]
        for t in threads:
            t.start()
        while True:
            item = dev_q.get()
            if item is _SENTINEL:
                break
            yield item
        for t in threads:
            t.join()
        if err:
            raise err[0]


def prefetch(loader, size: int = 2, device=None) -> PrefetchIterator:
    return PrefetchIterator(loader, size=size, device=device)
