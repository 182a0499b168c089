"""Size-gated planner hints.

``F.broadcast(df)`` is a *promise*, not a measurement: Spark ships the
whole frame to every executor whatever its size.  That is right for
domain-bounded dims (regions, event types, codebooks) but wrong for any
frame whose cardinality grows with the corpus — a doc-keyed dim that
broadcasts fine at sf0.1 is a multi-GB OOM at 100 TB.  ``broadcast_if_
small`` turns the hint into a measurement: probe the row count with a
bounded job (``limit(n+1).count()`` — the scan stops after n+1 rows, so
the probe cost is capped regardless of corpus size) and only attach the
hint when the frame is provably under the limit; above it, return the
frame unhinted and let the planner pick a shuffle join (or AQE pick a
broadcast from its own runtime statistics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Row-count proxy for "fits in a broadcast": ~50-100 B/row for the
# narrow (key, attr) dims this gates puts the default well under
# Spark's driver/executor broadcast comfort zone, while still passing
# every domain-bounded dim at any corpus size.
BROADCAST_ROW_LIMIT = 1_000_000


def broadcast_if_small(
    df: DataFrame, limit_rows: int = BROADCAST_ROW_LIMIT
) -> DataFrame:
    """Return ``F.broadcast(df)`` iff df has <= limit_rows rows.

    The probe is ``df.limit(limit_rows + 1).count()``: a LocalLimit stops
    each scan task early and the driver sums at most limit_rows+1, so the
    probe is O(limit) whatever the underlying size.  Frames above the
    limit come back unhinted — correctness is unchanged (the hint only
    steers the physical join strategy), the plan just degrades gracefully
    from broadcast-hash to shuffle join instead of OOMing an executor.
    """
    if limit_rows < 1:
        raise ValueError(f"limit_rows must be >= 1, got {limit_rows}")
    n = df.limit(limit_rows + 1).count()
    if n <= limit_rows:
        return F.broadcast(df)
    return df
