"""Streaming sessionization via the built-in ``session_window``.

The batch engine sessionizes with a lag-gap window (catalog
``sessionization``, ``event_session_path_topk``); the streaming tier gets
the same 30-min-gap semantics from Structured Streaming's native
``session_window`` aggregation — windows grow while events keep arriving
within the gap and CLOSE when the event-time watermark passes
``last_event + gap``, at which point append mode emits exactly one row per
session. No custom state code: this is the one stateful operator Spark
ships a purpose-built primitive for, so ``applyInPandasWithState`` (used by
``streaming/politeness.py`` where per-host budgets genuinely need custom
state) would be hand-rolling what the engine already does with merging
session state and watermark eviction built in.

Scale shape: state is partitioned by the grouping key (user), one state
row per OPEN session; the watermark bounds state size by the active-user
horizon, not the stream's history. Late events beyond the watermark drop
(the standard completeness/latency trade).

Test discipline (CLAUDE.md r3 lesson): sequential ``availableNow`` runs
sharing a checkpoint, phases advance EVENT time to move the watermark —
deterministic, no wall-clock timers (ProcessingTimeTimeout never lets a
streaming query finish).

Reference analog: the reference crawler has no streaming path at all (its
loop is a blocking fetch, /root/reference/crawler.py); this is the
Spark-native continuous-ingest counterpart of the batch sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_GAP = "30 minutes"
WATERMARK = "1 hour"


def sessionize_stream(
    events: DataFrame,
    gap: str = SESSION_GAP,
    watermark: str = WATERMARK,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """(user_id, session_start, session_end, n_events) per CLOSED session.

    ``events`` is a streaming DataFrame with an event-time timestamp
    ``ts_col``. In append mode a session row emits once the watermark
    passes ``session_end`` (= last event + gap, session_window's closed
    bound), so downstream sinks see each session exactly once.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap).alias("sw"),
        )
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            user_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
