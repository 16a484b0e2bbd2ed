"""In-memory per-session response cache, 300 s TTL, keyed by URL.

Parity: reference `src/sudan/cache.hpp:10-38` / `cache.cpp`. Lives on
whichever process performs the fetch: the driver for plan-time page
counting, an executor for partition reads (each executor keeps its own
cache — at 1000 executors that is exactly the locality you want, no
coordination traffic).
"""

from __future__ import annotations

import threading
import time

CACHE_TTL_SECONDS = 300


class ResponseCache:
    _instance: "ResponseCache | None" = None
    _instance_lock = threading.Lock()

    def __init__(self) -> None:
        self._entries: dict[str, tuple[str, float]] = {}
        self._lock = threading.Lock()

    @classmethod
    def instance(cls) -> "ResponseCache":
        with cls._instance_lock:
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

    def get(self, url: str) -> str:
        """Cached body for url, or '' when absent/expired."""
        with self._lock:
            entry = self._entries.get(url)
            if entry is None:
                return ""
            body, ts = entry
            if time.monotonic() - ts > CACHE_TTL_SECONDS:
                del self._entries[url]
                return ""
            return body

    def put(self, url: str, body: str) -> None:
        with self._lock:
            self._entries[url] = (body, time.monotonic())

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()
