"""Bounded persist registry shared by operators that cache intermediates.

Contract: callers persist a DataFrame they will materialize promptly
(within the same query execution); the registry unpersists the oldest
entries beyond ``keep`` so back-to-back operator calls don't accumulate
pinned storage for the session lifetime.  An entry evicted before its
first action simply recomputes — correctness is never affected, only the
cache/optimizer-fence benefit of that one call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []
_KEEP = 8


def persist_bounded(df: DataFrame) -> DataFrame:
    df = df.persist()
    _PERSISTED.append(df)
    while len(_PERSISTED) > _KEEP:
        try:
            _PERSISTED.pop(0).unpersist(blocking=False)
        except Exception:  # pragma: no cover - session already stopped
            pass
    return df
