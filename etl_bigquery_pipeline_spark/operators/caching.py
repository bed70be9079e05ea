"""Cache ownership for operator-internal ``.cache()`` frames.

Several operators (minhash / ngram-jaccard dedup, curation base, packing,
global row numbers) cache an intermediate frame because two or more
branches of the returned plan consume it. The operator returns a *lazy*
plan, so it can never know when that plan has been consumed — which
historically meant the cache outlived the query and a long-lived session
accumulated cached partitions until LRU pressure (round-2 verdict, "What's
wrong" #3).

This module gives every such cache an owner:

- ``scoped_cache(df)`` — what operators call instead of ``df.cache()``.
  The cached frame is registered in a bounded FIFO registry; once more
  than ``MAX_LIVE_CACHES`` operator caches exist, the oldest is
  unpersisted. Unpersisting is always *correctness-safe* in Spark (a plan
  that still references the frame simply recomputes it), so the bound
  turns unbounded growth into a fixed ceiling without any caller
  cooperation.
- ``cache_scope()`` — deterministic release for callers that know their
  consumption window: every frame cached inside the ``with`` block is
  unpersisted on exit. bench.py and the oracle sweep wrap each query in
  one, replacing the blunt ``spark.catalog.clearCache()``.
"""

from __future__ import annotations

import os
import threading
from collections import deque
from contextlib import contextmanager

from pyspark.sql import DataFrame

# Upper bound on simultaneously-live operator caches outside any
# cache_scope. Big enough that the branches of any single query keep
# their caches; small enough that a session invoking operators in a loop
# plateaus instead of growing.
MAX_LIVE_CACHES = 8

# Strict mode (SPARK_GRAFT_STRICT_CACHE_SCOPE=1, used by the test suite):
# a scoped_cache outside any cache_scope raises instead of falling back to
# the global registry. The fallback's silent LRU eviction would otherwise
# hide a missing cache_scope in a new code path — strict mode makes the
# omission loud where it's cheap to be loud.
STRICT_ENV = "SPARK_GRAFT_STRICT_CACHE_SCOPE"


class UnscopedCacheError(RuntimeError):
    """scoped_cache called outside a cache_scope while strict mode is on."""

_lock = threading.RLock()
_live: deque[DataFrame] = deque()
_scopes: list[list[DataFrame]] = []


def _unpersist_quietly(df: DataFrame) -> None:
    try:
        df.unpersist()
    except Exception:  # session already stopped — nothing to release
        pass


def scoped_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` with an owner: registered to the innermost active
    ``cache_scope`` (released at scope exit), or to the bounded global
    registry (oldest evicted beyond ``MAX_LIVE_CACHES``)."""
    with _lock:
        if not _scopes and os.environ.get(STRICT_ENV) == "1":
            raise UnscopedCacheError(
                "scoped_cache called outside a cache_scope with "
                f"{STRICT_ENV}=1; wrap the consumption window in "
                "cache_scope() so the cache has a deterministic owner"
            )
    cached = df.cache()
    with _lock:
        if _scopes:
            _scopes[-1].append(cached)
        else:
            _live.append(cached)
            while len(_live) > MAX_LIVE_CACHES:
                _unpersist_quietly(_live.popleft())
    return cached


@contextmanager
def cache_scope():
    """Unpersist every operator cache created inside the block on exit.

    Safe to nest; inner scopes release before outer ones. A frame
    unpersisted here but still referenced by a live plan is recomputed,
    not corrupted — exiting early (exception) therefore cannot break
    correctness, only warmth.
    """
    mine: list[DataFrame] = []
    with _lock:
        _scopes.append(mine)
    try:
        yield
    finally:
        with _lock:
            _scopes.remove(mine)
        for df in mine:
            _unpersist_quietly(df)


def live_cache_count() -> int:
    """Number of registry-owned caches currently live (tests/diagnostics)."""
    with _lock:
        return len(_live)
