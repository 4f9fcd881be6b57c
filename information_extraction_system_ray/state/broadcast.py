"""Broadcast helpers: put small sides in the object store exactly once."""

from __future__ import annotations

import ray

_CACHE: dict[str, "ray.ObjectRef"] = {}


def put_once(key: str, factory):
    """``ray.put(factory())`` memoized per driver process — model weights,
    alias dicts and cluster maps are shipped to the object store once and
    read by actors/tasks, never re-serialized per batch (SURVEY.md §2.4 J1).
    """
    if key not in _CACHE:
        _CACHE[key] = ray.put(factory())
    return _CACHE[key]


def clear_cache() -> None:
    _CACHE.clear()
