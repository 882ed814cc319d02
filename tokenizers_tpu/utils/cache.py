"""Bounded word-level cache (reference `tokenizers/src/utils/cache.rs`).

The reference cache is deliberately racy-but-safe (try_read/try_write, gives
up under contention) with capacity 10k and only caches keys < 256 bytes.  The
host path here is single-threaded per interpreter, so a plain bounded dict has
the same observable behavior: insert only while below capacity.
"""

from __future__ import annotations

from typing import Dict, Generic, Optional, TypeVar

K = TypeVar("K")
V = TypeVar("V")


class Cache(Generic[K, V]):
    __slots__ = ("capacity", "map")

    def __init__(self, capacity: int = 10_000):
        self.capacity = capacity
        self.map: Dict[K, V] = {}

    def get(self, key: K) -> Optional[V]:
        return self.map.get(key)

    def set(self, key: K, value: V) -> None:
        if len(self.map) < self.capacity:
            self.map[key] = value

    def clear(self) -> None:
        self.map.clear()

    def __len__(self) -> int:
        return len(self.map)
