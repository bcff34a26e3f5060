"""Host data loader with background prefetch.

Replaces ``torch.utils.data.DataLoader`` (reference
`core/data/create_dataset.py:59-74`).  The reference uses batch_size=1
everywhere, so this loader yields single dataset items (numpy dicts) with a
background thread pool keeping ``prefetch`` items decoded ahead of the
consumer — the host/TPU overlap that matters for step time.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np


class DataLoader:
    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 drop_last: bool = False, num_workers: int = 2,
                 prefetch: int = 4, seed: Optional[int] = None):
        assert batch_size == 1, "reference semantics: one frame per step"
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(0, num_workers)
        self.prefetch = max(1, prefetch)
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.dataset)

    def _order(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[dict]:
        order = self._order()
        if self.num_workers == 0:
            for i in order:
                yield self.dataset[int(i)]
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for i in order:
                    if stop.is_set():
                        return
                    q.put(self.dataset[int(i)])
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            # drain so the producer can observe the stop flag
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
