"""Memory + disk memoization decorator.

Equivalent of the reference's ``analysis/cache.py:6-56`` ``SimpleCache``:
an LRU in-memory layer over a pickle-file disk layer, keyed by function
name + arguments.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from functools import lru_cache, wraps
from pathlib import Path


class SimpleCache:
    def __init__(self, cache_dir: str = "simple_cache", memory_cache_size: int = 100):
        self.cache_dir = Path(cache_dir)
        self.memory_cache_size = memory_cache_size
        self.cache_dir.mkdir(parents=True, exist_ok=True)
        self._memoized = []

    def _key(self, name: str, args, kwargs) -> str:
        payload = repr((name, args, tuple(sorted(kwargs.items()))))
        return hashlib.sha1(payload.encode()).hexdigest()[:24]

    def cached(self, func):
        mem_func = lru_cache(maxsize=self.memory_cache_size)(func)
        self._memoized.append(mem_func)

        @wraps(func)
        def wrapper(*args, **kwargs):
            path = self.cache_dir / f"{func.__name__}_{self._key(func.__name__, args, kwargs)}.pkl"
            if path.exists():
                try:
                    with open(path, "rb") as f:
                        return pickle.load(f)
                except (pickle.PickleError, EOFError, TypeError):
                    pass
            try:
                result = mem_func(*args, **kwargs)
            except TypeError:  # unhashable args: skip the memory layer
                result = func(*args, **kwargs)
            with open(path, "wb") as f:
                pickle.dump(result, f)
            return result

        return wrapper

    def clear_cache(self, memory_only: bool = False):
        for f in self._memoized:
            f.cache_clear()
        if not memory_only:
            for p in self.cache_dir.glob("*.pkl"):
                os.remove(p)
