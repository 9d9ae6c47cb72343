"""Scoped DataFrame caches — persist() without session-lifetime leaks.

Operators persist intermediates whose usefulness ends with the query that
built them (exploded shingle tables, MinHash signatures, SimHash blocks).
A lazily-returned DataFrame still references those caches, so the operator
itself can never unpersist — and in a long-lived gate/bench session that
runs hundreds of queries the cached blocks accumulate in the shared heap.

The registry scopes each cache to the declared query that created it:

* operators call :func:`scoped_persist` instead of ``df.persist()``;
* the catalog's ``@query`` wrapper calls :func:`begin_scope(name)` before
  building a query's DataFrame, which unpersists every cache belonging to
  a DIFFERENT scope (that query's action is long finished) while keeping
  the current scope's own caches alive — Spark's CacheManager matches
  cached plans structurally, so a warm re-run of the same query still
  reuses the blocks it cached on the previous pass.

Direct (non-catalog) callers never enter a scope and keep today's plain
``persist`` semantics within the "default" scope.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

_SCOPES: dict[str, list[DataFrame]] = {}
_CLEANUPS: dict[str, list[Callable[[], None]]] = {}
_CURRENT: str = "default"


def scoped_persist(df: DataFrame, level=None) -> DataFrame:
    """``df.persist()`` registered to the current scope for later release."""
    df = df.persist() if level is None else df.persist(level)
    _SCOPES.setdefault(_CURRENT, []).append(df)
    return df


def register_scope_cleanup(fn: Callable[[], None]) -> None:
    """Run ``fn`` when the current scope is released — for non-persist
    leftovers a query's lifetime ends with (memory-sink temp views, stream
    staging dirs). Same lifecycle as scoped_persist: released when a
    DIFFERENT query begins, so the current query's result stays readable."""
    _CLEANUPS.setdefault(_CURRENT, []).append(fn)


def begin_scope(name: str) -> None:
    """Enter scope ``name``, releasing caches held by every other scope."""
    global _CURRENT
    _CURRENT = name
    for scope in [s for s in _SCOPES if s != name]:
        for df in _SCOPES.pop(scope):
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release
    for scope in [s for s in _CLEANUPS if s != name]:
        for fn in _CLEANUPS.pop(scope):
            try:
                fn()
            except Exception:
                pass


def release_all() -> None:
    """Unpersist every registered cache (end-of-run cleanup)."""
    global _CURRENT
    for scope in list(_SCOPES):
        for df in _SCOPES.pop(scope):
            try:
                df.unpersist()
            except Exception:
                pass
    for scope in list(_CLEANUPS):
        for fn in _CLEANUPS.pop(scope):
            try:
                fn()
            except Exception:
                pass
    _CURRENT = "default"
