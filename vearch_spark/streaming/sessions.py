"""Session windows — native Spark sessionization for streams and batch.

The batch `event_sessions` query derives 30-minute-gap sessions with
lag + running sum (one shuffle). The same semantics stream natively via
``F.session_window``: Spark's session state merges windows as events
arrive, the watermark bounds state, and the identical expression runs
in batch mode — one definition, two execution modes (beyond the
reference, whose streaming surface has no event-time state at all;
SURVEY §2.9).

Output-mode note: Spark supports append + complete (not update) for
streaming session aggregations. Production = append with the watermark
bounding both state and emission lag; the finite-file test uses
complete so final sessions (never passed by the watermark) still emit.

Boundary note: ``session_window`` closes a session when the next event
arrives ≥ gap after the previous (window end is exclusive); the
lag-based batch form splits on gap > threshold. The two differ only
for events exactly at the threshold — microsecond-grained event time
makes that measure-zero, and the cross-validation test asserts
equality on the driver data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def session_stats(
    events: DataFrame,
    ts_col: str = "ts_utc",
    user_col: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per (user, session) event counts and integer-microsecond spans.
    Works on a watermarked stream (state bounded by the watermark) or a
    batch DataFrame (plain aggregation) with the same plan text."""
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("_w"), user_col)
        .agg(
            F.count("*").alias("n_events"),
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))).alias(
                "dur_us"
            ),
        )
        .select(
            user_col,
            F.col("_w.start").alias("session_start"),
            "n_events",
            "dur_us",
        )
    )
