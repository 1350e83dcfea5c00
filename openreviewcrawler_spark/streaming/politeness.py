"""Stateful streaming politeness — per-host budget admission on a stream.

The batch rounds enforce per-host budgets with a window top-k
(operators/scheduler.admit). A CONTINUOUS ingest needs the same politeness
decision with memory across micro-batches: "how many URLs has this host
already been granted?" is crawl state, not a per-batch aggregate. That is
exactly Structured Streaming's arbitrary-stateful-processing surface —
``applyInPandasWithState`` keeps one tiny state row per host (the granted
count), processes each micro-batch's candidates for that host as Arrow
batches (no per-row Python), and admits deterministically.

Semantics (deterministic, replayable):
  * per host, at most ``budget`` URLs are admitted per state lifetime (the
    streaming analog of the reference's per-venue seen-set + the batch
    admit's budget);
  * within a micro-batch, candidates are ranked by (priority, url) — the
    same explicit tie-break discipline as the batch scheduler — so the
    admitted subset does not depend on arrival order inside the batch;
  * each admitted row carries ``admit_seq`` (1-based, contiguous per host
    across the whole stream), so downstream fetch ordering is reproducible.

Scale notes: state is ONE long per host; the stream shuffles on host exactly
once per micro-batch. With ``state_ttl_ms`` set, hosts idle longer than the
TTL in EVENT TIME are EVICTED via ``GroupStateTimeout.EventTimeTimeout`` —
at 10^8-host web scale the state store would otherwise grow monotonically
with every host ever seen (dead hosts dominate a long crawl). Eviction
forgets the granted count, so a host that reappears after the TTL gets a
fresh budget — the crawl-delay interpretation: a budget bounds request RATE
per politeness window, not requests-ever; pick the TTL >= the crawl's
politeness epoch. ``state_ttl_ms=None`` keeps the bounded-host NoTimeout
behavior (lifetime cap).

Why event-time, not processing-time, timers: (a) determinism — the whole
crawl contract is replayability at any parallelism, and a watermark derived
from candidate discovery timestamps evicts the SAME hosts at the same
stream positions on every replay, while wall-clock timers do not; (b) the
engine — Spark re-runs no-data batches unconditionally while any
processing-time timer exists (``shouldRunAnotherBatch`` is always true for
ProcessingTimeTimeout), so a ProcessingTime query neither quiesces under
``processAllAvailable`` nor terminates under ``Trigger.AvailableNow``;
event-time timers fire only when the watermark advances, which composes
with both.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ADMIT_SCHEMA = "host string, url string, priority long, admit_seq long"
_STATE_SCHEMA = "granted long"


def _make_admit_fn(state_ttl_ms: int | None, event_time_col: str):
    """Build the per-host admission function; TTL and event-time column are
    plan-time closures so the worker-side function stays a plain picklable
    callable."""

    def _admit_host(key, batches: Iterator[pd.DataFrame], state: GroupState):
        (host,) = key
        if state_ttl_ms is not None and state.hasTimedOut:
            # dead-host eviction: drop the state row; no output for this key
            state.remove()
            yield pd.DataFrame(columns=["host", "url", "priority", "admit_seq"])
            return
        budget = None
        rows = []
        for pdf in batches:
            rows.append(pdf)
            if budget is None and len(pdf):
                budget = int(pdf["budget"].iloc[0])
        cand = pd.concat(rows, ignore_index=True) if rows else pd.DataFrame()
        granted = state.get[0] if state.exists else 0
        remaining = max(0, (budget or 0) - granted)
        if remaining > 0 and len(cand):
            take = cand.sort_values(["priority", "url"], kind="mergesort").head(remaining)
            take = take.reset_index(drop=True)
            take["admit_seq"] = range(granted + 1, granted + 1 + len(take))
            state.update((granted + len(take),))
            out = take[["host", "url", "priority", "admit_seq"]]
        else:
            state.update((granted,))
            out = pd.DataFrame(columns=["host", "url", "priority", "admit_seq"])
        if state_ttl_ms is not None and len(cand):
            # re-arm the eviction timer: expire TTL past this host's newest
            # candidate (event time). The engine requires a timestamp beyond
            # the current watermark — a host whose batch is entirely late
            # data keeps a minimal timer one tick past the watermark.
            ts_max_ms = int(pd.Timestamp(cand[event_time_col].max()).value // 10**6)
            state.setTimeoutTimestamp(
                max(ts_max_ms + state_ttl_ms, state.getCurrentWatermarkMs() + 1)
            )
        yield out

    return _admit_host


def admit_stream(
    candidates: DataFrame,
    budget: int = 8,
    state_ttl_ms: int | None = None,
    event_time_col: str = "ts",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming per-host budget admission.

    ``candidates``: streaming DataFrame with (host, url, priority) — plus an
    ``event_time_col`` timestamp (candidate discovery time) when
    ``state_ttl_ms`` is set. Returns the admitted stream with ``admit_seq``.
    One state row per host; with a TTL, hosts idle past it in event time are
    evicted when the watermark passes their timer, so state stays bounded by
    the number of RECENTLY ACTIVE hosts, not hosts ever seen.
    ``watermark_delay`` is the out-of-order allowance handed to
    ``withWatermark`` (0 for strictly ordered discovery streams).
    """
    from pyspark.sql import functions as F

    if state_ttl_ms is None:
        with_budget = candidates.withColumn("budget", F.lit(budget).cast("long"))
        timeout = GroupStateTimeout.NoTimeout
    else:
        with_budget = candidates.withWatermark(
            event_time_col, watermark_delay
        ).withColumn("budget", F.lit(budget).cast("long"))
        timeout = GroupStateTimeout.EventTimeTimeout
    return with_budget.groupBy("host").applyInPandasWithState(
        _make_admit_fn(state_ttl_ms, event_time_col),
        outputStructType=ADMIT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
