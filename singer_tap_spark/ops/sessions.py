"""Sessionization — gap-based event sessions, batch AND streaming.

Two equivalent shapes:

- :func:`sessionize` — ``F.session_window`` aggregation.  Works on a batch
  DataFrame (one shuffle; Catalyst's native session-merge) and UNCHANGED on
  a streaming DataFrame (state-store backed, watermark-bounded — the
  Structured Streaming session operator the reference has no analogue of,
  SURVEY §2.2).
- the lag + cumulative-sum window form (``__spark_entry__.q_sessionization``)
  — same semantics, emits an explicit per-user session_id; kept as the
  oracle-shaped twin.

Both start a new session when an event arrives STRICTLY more than ``gap``
after the previous one (chained gap, not fixed windows).  Boundary semantics
are measured, not assumed: ``session_window`` merges windows that merely
touch, so an event landing exactly ``gap`` later stays in the SAME session —
identical to the lag+cumsum twin's ``> gap`` test and the DuckDB oracles
(pinned by tests/test_sessions.py::test_session_window_exact_gap_boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """One row per (user, session): bounds + event count.

    ``watermark``: set for streaming input (bounds session state; late
    events beyond it are dropped by the engine).  Output columns:
    (user_col, session_start, session_end, n_events) where the bounds are
    observed event times (min/max ts), not the padded window edges.
    """
    src = events
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap))
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(user_col, "session_start", "session_end", "n_events")
    )
