"""Background-thread batch prefetching.

The reference overlaps host featurization with device compute via DataLoader
worker processes (num_workers 10-20, train.py / train_chembl33_baseline.py).
Here a bounded-queue thread pipeline does the same for our batch iterators:
host RDKit-equivalent featurization (tokenize/corrupt/ppgraph) runs ahead
while the TPU executes the previous step.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional


_SENTINEL = object()


def prefetch(iterator: Iterator, buffer_size: int = 4) -> Iterator:
    """Wrap any batch iterator with a background producer thread."""
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    error: list = []

    def producer():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # propagate into the consumer
            error.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if error:
                raise error[0]
            return
        yield item


class PrefetchedLoader:
    """Reusable multi-epoch loader: ``for batch in loader.epoch():``"""

    def __init__(self, make_iterator, buffer_size: int = 4):
        self._make = make_iterator
        self._buffer = buffer_size

    def epoch(self) -> Iterator:
        return prefetch(self._make(), self._buffer)
