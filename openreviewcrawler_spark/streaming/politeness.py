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
  * per host, at most ``budget`` URLs are EVER admitted (lifetime cap — the
    streaming analog of the reference's per-venue seen-set + the batch
    admit's budget);
  * within a micro-batch, candidates are ranked by (priority, url) — the
    same explicit tie-break discipline as the batch scheduler — so the
    admitted subset does not depend on arrival order inside the batch;
  * each admitted row carries ``admit_seq`` (1-based, contiguous per host
    across the whole stream), so downstream fetch ordering is reproducible.

Scale notes: state is ONE long per host (bounded by |hosts|, not |urls|);
the stream shuffles on host exactly once per micro-batch; a real
deployment adds GroupStateTimeout + watermark-driven eviction for dead
hosts — here hosts are a bounded dimension and state stays NoTimeout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ADMIT_SCHEMA = "host string, url string, priority long, admit_seq long"
_STATE_SCHEMA = "granted long"


def _admit_host(key, batches: Iterator[pd.DataFrame], state: GroupState):
    (host,) = key
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
        yield take[["host", "url", "priority", "admit_seq"]]
    else:
        state.update((granted,))
        yield pd.DataFrame(columns=["host", "url", "priority", "admit_seq"])


def admit_stream(candidates: DataFrame, budget: int = 8) -> DataFrame:
    """Streaming per-host budget admission.

    ``candidates``: streaming DataFrame with (host, url, priority). Returns
    the admitted stream with ``admit_seq``. One state row per host.
    """
    from pyspark.sql import functions as F

    with_budget = candidates.withColumn("budget", F.lit(budget).cast("long"))
    return with_budget.groupBy("host").applyInPandasWithState(
        _admit_host,
        outputStructType=ADMIT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
