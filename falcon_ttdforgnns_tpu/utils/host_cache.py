"""Host-side (CPU) embedding caches.

Parity with `tt_utils.py:204-278`: ``LRUCache`` (OrderedDict LRU with
hit/miss stats) and ``TensorCache`` (fixed-capacity array cache with
LRU-by-access-time eviction).  The reference instantiates TensorCache at
`gnn_model.py:105` (never used in forward — kept for API completeness and
for host-side feature staging at papers100M scale).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, Optional

import numpy as np


class LRUCache:
    def __init__(self, capacity: int):
        self.cache: OrderedDict = OrderedDict()
        self.capacity = capacity
        self.hits = 0
        self.misses = 0

    def get(self, key):
        if key in self.cache:
            self.cache.move_to_end(key)
            self.hits += 1
            return self.cache[key]
        self.misses += 1
        return None

    def put(self, key, value) -> None:
        if key in self.cache:
            self.cache.move_to_end(key)
        elif len(self.cache) >= self.capacity:
            self.cache.popitem(last=False)
        self.cache[key] = value

    def stats(self) -> Dict[str, int]:
        return {"hits": self.hits, "misses": self.misses}


class TensorCache:
    """Fixed-capacity (keys, values) arrays with LRU eviction by access
    timestamp — vectorized batch get/put on top of the reference's
    single-key API."""

    def __init__(self, capacity: int, embedding_dim: int):
        self.capacity = capacity
        self.keys = -np.ones(capacity, dtype=np.int64)
        self.values = np.zeros((capacity, embedding_dim), dtype=np.float32)
        self.access_time = np.zeros(capacity, dtype=np.int64)
        self.time = 0
        self.hits = 0
        self.misses = 0

    def get(self, key: int) -> Optional[np.ndarray]:
        self.time += 1
        loc = np.nonzero(self.keys == key)[0]
        if len(loc):
            self.access_time[loc[0]] = self.time
            self.hits += 1
            return self.values[loc[0]]
        self.misses += 1
        return None

    def put(self, key: int, value: np.ndarray) -> None:
        self.time += 1
        loc = np.nonzero(self.keys == key)[0]
        if len(loc) == 0:
            loc = int(np.argmin(self.access_time))
        else:
            loc = int(loc[0])
        self.keys[loc] = key
        self.values[loc] = value
        self.access_time[loc] = self.time

    # vectorized batch interface (beyond the reference)
    def get_batch(self, keys: np.ndarray):
        self.time += 1
        order = np.argsort(self.keys)
        skeys = self.keys[order]
        pos = np.clip(np.searchsorted(skeys, keys), 0, self.capacity - 1)
        hit = skeys[pos] == keys
        locs = order[pos]
        self.access_time[locs[hit]] = self.time
        self.hits += int(hit.sum())
        self.misses += int((~hit).sum())
        return hit, self.values[locs]

    def stats(self) -> Dict[str, int]:
        return {"hits": self.hits, "misses": self.misses}
