"""Session cache lifetime for operator-internal ``persist`` calls.

Several operators persist an intermediate that both sides of a self-join
read (LSH banding, SimHash bands, sign-LSH buckets, the CUBE finest
grouping).  The persist must outlive the *caller's* action, so the
operator cannot unpersist it itself — instead every such frame is
registered here and the caller (or the next query in a long-lived
session) releases the batch with :func:`release_caches`.  Without this,
cached blocks accumulate in executor storage memory for the life of the
SparkSession.
"""

from __future__ import annotations

_LIVE_CACHES: list = []


def track_cache(df):
    """Register an operator-internal persisted DataFrame; returns it."""
    _LIVE_CACHES.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked intermediate; returns how many were
    released.  Safe to call at any time — releasing before a dependent
    action only costs recomputation, never correctness."""
    n = 0
    while _LIVE_CACHES:
        df = _LIVE_CACHES.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
