"""Host data loader with background prefetch.

Replaces ``torch.utils.data.DataLoader`` (reference
`core/data/create_dataset.py:59-74`).  The reference uses batch_size=1
everywhere, so this loader yields single dataset items (numpy dicts) with a
background thread pool keeping ``prefetch`` items decoded ahead of the
consumer — the host/TPU overlap that matters for step time.
"""

from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor
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

        # num_workers decode threads over a sliding window of in-flight
        # items (>= prefetch), yielded strictly in `order` — same epoch
        # stream as num_workers=0.  Item decode is numpy-heavy (undistort,
        # resize, ray sampling) and releases the GIL, so workers overlap
        # with each other and with the consumer's device step.
        window = max(self.prefetch, self.num_workers)
        ex = ThreadPoolExecutor(max_workers=self.num_workers)
        pending: deque = deque()
        it = iter(order)
        try:
            for i in it:
                pending.append(ex.submit(self.dataset.__getitem__, int(i)))
                if len(pending) >= window:
                    break
            while pending:
                item = pending.popleft().result()
                nxt = next(it, None)
                if nxt is not None:
                    pending.append(
                        ex.submit(self.dataset.__getitem__, int(nxt)))
                yield item
        finally:
            for f in pending:
                f.cancel()
            ex.shutdown(wait=False)
