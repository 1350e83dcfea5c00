"""Event-stream OLAP: ordered conversion funnels and cohort retention.

Not present in the reference (it has no event stream); required for the
training-data/analytics surface over the driver's ``events`` table — the
batch twins of the metrics a crawl/ingest control plane tracks per user
or per host (reach, conversion, retention of activity over time).

Scale shapes:

* ``funnel`` — ONE shuffle on the user key; the ordered-step semantics
  ("step i counts only at-or-after the first qualified step i-1 event")
  are stacked running-min window passes over the SAME (user, time)
  sort, so Spark reuses one exchange + one sort for all steps; the
  per-user flags then collapse map-side into a single global row before
  the constant-size step table is exploded. No driver-side iteration,
  no joins, integer-only output (ppm via BIGINT division).
* ``cohort_retention`` — two groupBys on the user key (first-seen week,
  distinct active weeks); the join attaching the cohort week is on the
  same key the aggregates shuffled on, so AQE plans it co-partitioned.
  Output is a (cohort_week x week_offset) matrix — bounded by the
  square of the calendar span, independent of corpus size.

Cross-engine parity: timestamps are compared/ordered as epoch millis
(Spark ``unix_millis`` after the NTZ cast == DuckDB ``epoch_ms``), every
window frame is explicit ROWS-bounded with a full tie-break, and all
outputs are BIGINT (ppm by integer division — no float anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: conversion funnel steps (shared default with the SQL twin)
FUNNEL_STEPS = ("view", "click", "purchase")


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_ms",
    id_col: str = "event_id",
) -> DataFrame:
    """Ordered conversion funnel: one row per step with the number of
    users who reached it IN ORDER and the conversion ppm vs the previous
    step. A step-i event qualifies only if some qualified step-(i-1)
    event exists at-or-before it (running min over the per-user event
    order) — out-of-order events never count.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = events
    prev_reach = None
    for i, step in enumerate(steps):
        qualified = F.col(type_col) == step
        if prev_reach is not None:
            qualified = qualified & prev_reach.isNotNull()
        df = df.withColumn(f"__q{i}", F.when(qualified, F.col(ts_col)))
        df = df.withColumn(f"__r{i}", F.min(f"__q{i}").over(w))
        prev_reach = F.col(f"__r{i}")

    per_user = df.groupBy(user_col).agg(
        *[
            F.max(F.col(f"__q{i}").isNotNull().cast("int")).alias(f"s{i}")
            for i in range(len(steps))
        ]
    )
    totals = per_user.agg(
        *[F.sum(f"s{i}").cast("long").alias(f"n{i}") for i in range(len(steps))]
    )
    step_rows = totals.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).cast("long").alias("step_idx"),
                        F.lit(step).alias("step"),
                        F.col(f"n{i}").alias("n_users"),
                        F.col(f"n{max(i - 1, 0)}").alias("prev"),
                    )
                    for i, step in enumerate(steps)
                ]
            )
        ).alias("e")
    ).select("e.*")
    conv = F.when(
        F.col("prev") > 0,
        F.expr("(n_users * cast(1000000 as bigint)) div prev"),
    ).otherwise(F.lit(0))
    return step_rows.select(
        "step_idx", "step", "n_users", conv.cast("long").alias("conv_ppm")
    )


def funnel_sql(
    events_cte: str, steps: tuple[str, ...] = FUNNEL_STEPS
) -> str:
    """DuckDB twin of :func:`funnel`. ``events_cte`` must select
    (user_id, event_id, event_type, ts_ms)."""
    frame = (
        "over (partition by user_id order by ts_ms, event_id "
        "rows between unbounded preceding and current row)"
    )
    ctes = [f"ev as ({events_cte})"]
    prev = None
    src = "ev"
    for i, step in enumerate(steps):
        cond = f"event_type = '{step}'"
        if prev is not None:
            cond += f" and {prev} is not null"
        ctes.append(
            f"q{i} as (select *, case when {cond} then ts_ms end as c{i} from {src})"
        )
        ctes.append(f"r{i} as (select *, min(c{i}) {frame} as m{i} from q{i})")
        prev, src = f"m{i}", f"r{i}"
    flags = ", ".join(
        f"max(case when c{i} is not null then 1 else 0 end) as s{i}"
        for i in range(len(steps))
    )
    sums = ", ".join(f"sum(s{i})::BIGINT as n{i}" for i in range(len(steps)))
    ctes.append(f"pu as (select user_id, {flags} from {src} group by user_id)")
    ctes.append(f"tot as (select {sums} from pu)")
    selects = []
    for i, step in enumerate(steps):
        prev_n = f"n{max(i - 1, 0)}"
        selects.append(
            f"select {i + 1}::BIGINT as step_idx, '{step}' as step, "
            f"n{i} as n_users, (case when {prev_n} > 0 then "
            f"(n{i} * 1000000) // {prev_n} else 0 end)::BIGINT as conv_ppm "
            "from tot"
        )
    return "with " + ",\n".join(ctes) + "\n" + "\nunion all\n".join(selects)


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_ms_col: str = "ts_ms",
    week_ms: int = 7 * 86400000,
) -> DataFrame:
    """(cohort_week, week_offset, n_users): users grouped by their
    first-seen week, counted in every later week they were active."""
    wk = F.expr(f"{ts_ms_col} div cast({week_ms} as bigint)")
    ev = events.select(F.col(user_col).alias("user_id"), wk.alias("wk"))
    first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    active = ev.distinct()
    joined = active.join(first, "user_id")
    return (
        joined.groupBy(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            (F.col("wk") - F.col("cohort_week")).cast("long").alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


def cohort_retention_sql(events_cte: str, week_ms: int = 7 * 86400000) -> str:
    """DuckDB twin of :func:`cohort_retention`. ``events_cte`` must select
    (user_id, ts_ms)."""
    return f"""
with ev as (
  select user_id, ts_ms // {week_ms} as wk from ({events_cte})
),
first_seen as (select user_id, min(wk) as cohort_week from ev group by user_id),
act as (select distinct user_id, wk from ev)
select f.cohort_week::BIGINT as cohort_week,
       (a.wk - f.cohort_week)::BIGINT as week_offset,
       count(*)::BIGINT as n_users
from act a join first_seen f using (user_id)
group by 1, 2
"""


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_ms",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over the per-user event
    stream: for every consecutive pair in each user's (ts, id)-ordered
    history, count (prev_type -> next_type) and its probability among
    all transitions leaving prev_type. The session-flow fingerprint a
    crawl/ingest control plane watches for bot loops (self-transitions
    near 1.0) and funnel leaks (purchase rows that never follow click).

    Scale shape: ONE shuffle on the user key for the lag window; the
    pair table then collapses map-side into at most |types|^2 rows, so
    the per-prev row totals attach via a window over that BOUNDED
    aggregate (never over the event stream). Integer-only output
    (ppm by BIGINT division); tie-break on event_id makes the order —
    and therefore the pair multiset — total and engine-independent.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.withColumn("__prev", F.lag(type_col).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(
            F.col("__prev").alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    wt = Window.partitionBy("prev_type")
    return pairs.withColumn("row_total", F.sum("n").over(wt)).select(
        "prev_type",
        "next_type",
        F.col("n").cast("long").alias("n"),
        F.col("row_total").cast("long").alias("row_total"),
        F.expr("cast((n * cast(1000000 as bigint)) div row_total as bigint)").alias(
            "prob_ppm"
        ),
    )


def transition_matrix_sql(events_cte: str) -> str:
    """DuckDB twin of :func:`transition_matrix`. ``events_cte`` must
    select (user_id, event_id, event_type, ts_ms)."""
    return f"""
with ev as ({events_cte}),
lagged as (
  select event_type as next_type,
         lag(event_type) over (
           partition by user_id order by ts_ms, event_id
         ) as prev_type
  from ev
),
pairs as (
  select prev_type, next_type, count(*) as n
  from lagged where prev_type is not null
  group by prev_type, next_type
)
select prev_type, next_type, n::BIGINT as n,
       (sum(n) over (partition by prev_type))::BIGINT as row_total,
       ((n * 1000000) // (sum(n) over (partition by prev_type)))::BIGINT
         as prob_ppm
from pairs
"""


def daily_anomaly(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts_ms",
    count_col: str | None = None,
    min_prior: int = 3,
    day_ms: int = 86400000,
) -> DataFrame:
    """Trailing-median spike detection on the per-(type, day) volume
    series: a day whose count exceeds 2x the LOWER MEDIAN of the
    previous <=7 observed days is a spike — the volume alarm a crawl
    control plane runs per host/status and an ingest plane per event
    type (bot bursts, replay storms, scraper loops). Semantics are over
    OBSERVED days: gap days contribute nothing to the window (a rate
    per wall-clock day would need a calendar spine — different op).

    Scale shape: ONE groupBy collapses the stream to (type, day) rows —
    bounded by types x calendar span, NOT the corpus — so the trailing
    window runs over that bounded series. Lower median (element
    (n+1) div 2 of the sorted window) keeps everything BIGINT: exact,
    no cross-engine float; a mean-based median would not be.

    ``count_col``: pre-aggregated volume column; None counts rows.
    """
    day = F.expr(f"{ts_col} div cast({day_ms} as bigint)")
    cnt = (
        F.sum(count_col).cast("long")
        if count_col
        else F.count("*").cast("long")
    )
    daily = events.groupBy(
        F.col(type_col).alias("event_type"), day.cast("long").alias("day")
    ).agg(cnt.alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    arr = F.sort_array(F.collect_list("n").over(w))
    scored = daily.withColumn("__arr", arr).select(
        "event_type",
        "day",
        "n",
        F.size("__arr").cast("long").alias("n_prior"),
        # ANSI: element_at(arr, 0) raises — guard the empty first window
        F.when(
            F.size("__arr") > 0,
            F.element_at(
                "__arr", ((F.size("__arr") + 1) / 2).cast("int")
            ),
        ).alias("med"),
    )
    return scored.select(
        "event_type",
        "day",
        "n",
        "n_prior",
        F.coalesce(F.col("med"), F.lit(0)).cast("long").alias("med"),
        (
            (F.col("n_prior") >= min_prior) & (F.col("n") > 2 * F.col("med"))
        ).alias("is_spike"),
    )


def daily_anomaly_sql(
    daily_cte: str, min_prior: int = 3, day_ms: int = 86400000
) -> str:
    """DuckDB twin of :func:`daily_anomaly`. ``daily_cte`` must select
    (event_type, ts_ms) rows (one per event) — or pre-aggregated rows
    with an ``n`` column when mirrored manually."""
    return f"""
with ev as ({daily_cte}),
daily as (
  select event_type, (ts_ms // {day_ms})::BIGINT as day,
         count(*)::BIGINT as n
  from ev group by 1, 2
),
scored as (
  -- an EMPTY frame yields NULL (not []) in DuckDB: coalesce it so the
  -- first observed day matches Spark's empty collect_list
  select event_type, day, n,
         list_sort(coalesce(list(n) over (
           partition by event_type order by day
           rows between 7 preceding and 1 preceding
         ), [])) as arr
  from daily
)
select event_type, day, n,
       len(arr)::BIGINT as n_prior,
       coalesce(arr[((len(arr) + 1) // 2)::INT], 0)::BIGINT as med,
       (len(arr) >= {min_prior}
        and n > 2 * coalesce(arr[((len(arr) + 1) // 2)::INT], 0))
         as is_spike
from scored
"""


def bot_detect(
    events: DataFrame,
    min_events: int = 10,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_ms",
    id_col: str = "event_id",
) -> DataFrame:
    """Metronome-bot detection from inter-arrival regularity: a user
    whose event gaps have a squared coefficient of variation below 0.1
    (cv^2 = n*S2/S1^2 - 1 over the gap series) is a timer, not a human —
    the per-user twin of the crawl plane's trap/politeness telemetry.
    Humans are bursty (cv ~ 1, exponential-ish); schedulers are flat.

    Scale shape: ONE shuffle on the user key — the lag window and the
    per-user aggregate share the same partitioning; output is only the
    flagged users. Float parity: S1/S2 are exact DECIMAL sums; the
    cv^2 < 0.1 test is cross-multiplied to ``10*n*S2 < 11*S1^2`` and
    evaluated on double casts with identical expression text in both
    engines (per-row double arithmetic is bit-identical); the mean gap
    output is floor(S1/n) — integer-only columns.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    g = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("etype"),
        F.col(ts_col).alias("ts"),
        (F.col(ts_col) - F.lag(ts_col).over(w)).alias("gap"),
        (F.col(type_col) == F.lag(type_col).over(w))
        .cast("int")
        .alias("self_tr"),
    )
    agg = g.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.count("gap").cast("long").alias("n_gaps"),
        F.sum(F.col("gap").cast("decimal(38,0)")).alias("s1"),
        F.sum(
            F.col("gap").cast("decimal(19,0)")
            * F.col("gap").cast("decimal(19,0)")
        ).alias("s2"),
        F.sum("self_tr").cast("long").alias("n_self"),
    )
    d = (
        agg.withColumn("ngd", F.col("n_gaps").cast("double"))
        .withColumn("s1d", F.col("s1").cast("double"))
        .withColumn("s2d", F.col("s2").cast("double"))
    )
    flagged = d.filter(
        (F.col("n_gaps") >= min_events)
        & F.expr("10.0 * ngd * s2d < 11.0 * s1d * s1d")
    )
    return flagged.select(
        "user_id",
        "n_events",
        "n_gaps",
        F.expr("cast(floor(s1d / ngd) as bigint)").alias("gap_mean_ms"),
        F.expr(
            "cast((n_self * cast(1000000 as bigint))"
            " div (n_events - 1) as bigint)"
        ).alias("self_ppm"),
    )


def bot_detect_sql(events_cte: str, min_events: int = 10) -> str:
    """DuckDB twin of :func:`bot_detect`. ``events_cte`` must select
    (user_id, event_id, event_type, ts_ms)."""
    return f"""
with ev as ({events_cte}),
g as (
  select user_id, event_type,
         ts_ms - lag(ts_ms) over (
           partition by user_id order by ts_ms, event_id
         ) as gap,
         case when event_type = lag(event_type) over (
           partition by user_id order by ts_ms, event_id
         ) then 1 else 0 end as self_tr
  from ev
),
agg as (
  select user_id, count(*)::BIGINT as n_events,
         count(gap)::BIGINT as n_gaps,
         sum(gap::DECIMAL(38,0)) as s1,
         sum(gap::DECIMAL(19,0) * gap::DECIMAL(19,0)) as s2,
         sum(self_tr)::BIGINT as n_self
  from g group by user_id
),
d as (
  select *, n_gaps::DOUBLE as ngd, s1::DOUBLE as s1d, s2::DOUBLE as s2d
  from agg
)
select user_id, n_events, n_gaps,
       floor(s1d / ngd)::BIGINT as gap_mean_ms,
       ((n_self * 1000000) // (n_events - 1))::BIGINT as self_ppm
from d
where n_gaps >= {min_events} and 10.0 * ngd * s2d < 11.0 * s1d * s1d
"""


#: dyadic gap-bucket ladder (upper bounds in ms; the last bucket is open).
#: Shared as data so the Spark CASE and the SQL CASE are generated from the
#: SAME literals and can never drift.
GAP_BUCKETS_MS = (
    (1_000, "lt_1s"),
    (10_000, "1s_10s"),
    (60_000, "10s_1m"),
    (600_000, "1m_10m"),
    (3_600_000, "10m_1h"),
)
GAP_BUCKET_OPEN = "ge_1h"


def _gap_bucket_case(col: str) -> str:
    """Engine-shared CASE ladder text ({col} is the gap-ms expression)."""
    arms = " ".join(
        f"when {col} < {ub} then '{name}'" for ub, name in GAP_BUCKETS_MS
    )
    return f"case {arms} else '{GAP_BUCKET_OPEN}' end"


def gap_histogram(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    id_col: str = "event_id",
) -> DataFrame:
    """Inter-event gap histogram: the distribution of per-user
    consecutive-event gaps over a fixed dyadic bucket ladder — the
    latency fingerprint that separates human browse cadence (seconds to
    minutes) from scripted bursts (sub-second) and batch replays
    (hour+). The streaming politeness tier consumes the same buckets as
    its delay prior.

    Scale shape: ONE shuffle on the user key for the lag window, then
    the gap rows collapse map-side into at most len(GAP_BUCKETS_MS)+1
    output rows. Integer-only output (bounds, counts, share ppm); the
    (ts, id) tie-break makes the gap multiset total and
    engine-independent."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gaps = (
        events.withColumn("__gap", F.col(ts_col) - F.lag(ts_col).over(w))
        .filter(F.col("__gap").isNotNull())
        .selectExpr(f"{_gap_bucket_case('__gap')} as bucket", "__gap as gap")
    )
    agg = gaps.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n"),
        F.min("gap").cast("long").alias("min_gap_ms"),
        F.max("gap").cast("long").alias("max_gap_ms"),
    )
    wt = Window.partitionBy()
    return agg.withColumn(
        "total", F.sum("n").over(wt)
    ).selectExpr(
        "bucket",
        "n",
        "min_gap_ms",
        "max_gap_ms",
        "cast((n * cast(1000000 as bigint)) div total as bigint) as share_ppm",
    )


def gap_histogram_sql(events_cte: str) -> str:
    """DuckDB twin of :func:`gap_histogram`. ``events_cte`` must select
    (user_id, event_id, ts_ms)."""
    case = _gap_bucket_case("gap")
    return f"""
with ev as ({events_cte}),
g as (
  select ts_ms - lag(ts_ms) over (
           partition by user_id order by ts_ms, event_id
         ) as gap
  from ev
),
b as (select {case} as bucket, gap from g where gap is not null),
agg as (
  select bucket, count(*)::BIGINT as n,
         min(gap)::BIGINT as min_gap_ms, max(gap)::BIGINT as max_gap_ms
  from b group by bucket
)
select bucket, n, min_gap_ms, max_gap_ms,
       ((n * 1000000) // (sum(n) over ()))::BIGINT as share_ppm
from agg
"""


def last_touch_attribution(
    events: DataFrame,
    touch_type: str = "click",
    convert_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_ms",
    id_col: str = "event_id",
) -> DataFrame:
    """Last-touch attribution: for every conversion event, the most
    recent PRIOR touch event by the same user (strictly-before by the
    (ts, id) total order) and the touch->conversion latency. The
    training-data twin asks "which crawl seed produced this document";
    the marketing twin is the classic last-click report.

    Scale shape: ONE shuffle on the user key; the attributed touch rides
    a running ``last(..., ignorenulls)`` over an explicit ROWS frame
    ending 1 PRECEDING (so a conversion can never attribute to itself
    even if a touch shares its timestamp), evaluated in the same sort
    the window established — no self-join, no per-user collect. Output
    is integer-only."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_id = F.when(F.col(type_col) == touch_type, F.col(id_col))
    touch_ts = F.when(F.col(type_col) == touch_type, F.col(ts_col))
    out = (
        events.withColumn("touch_event_id", F.last(touch_id, True).over(w))
        .withColumn("touch_ts_ms", F.last(touch_ts, True).over(w))
        .filter(
            (F.col(type_col) == convert_type)
            & F.col("touch_event_id").isNotNull()
        )
    )
    return out.select(
        F.col(id_col).cast("long").alias("convert_event_id"),
        F.col(user_col).cast("long").alias("user_id"),
        F.col("touch_event_id").cast("long").alias("touch_event_id"),
        (F.col(ts_col) - F.col("touch_ts_ms")).cast("long").alias("gap_ms"),
    )


def last_touch_attribution_sql(
    events_cte: str,
    touch_type: str = "click",
    convert_type: str = "purchase",
) -> str:
    """DuckDB twin of :func:`last_touch_attribution`. ``events_cte`` must
    select (user_id, event_id, event_type, ts_ms)."""
    return f"""
with ev as ({events_cte}),
t as (
  select user_id, event_id, event_type, ts_ms,
         last_value(case when event_type = '{touch_type}' then event_id end
                    ignore nulls) over (
           partition by user_id order by ts_ms, event_id
           rows between unbounded preceding and 1 preceding
         ) as touch_event_id,
         last_value(case when event_type = '{touch_type}' then ts_ms end
                    ignore nulls) over (
           partition by user_id order by ts_ms, event_id
           rows between unbounded preceding and 1 preceding
         ) as touch_ts_ms
  from ev
)
select event_id::BIGINT as convert_event_id, user_id::BIGINT as user_id,
       touch_event_id::BIGINT as touch_event_id,
       (ts_ms - touch_ts_ms)::BIGINT as gap_ms
from t
where event_type = '{convert_type}' and touch_event_id is not null
"""


def touch_journey(
    events: DataFrame,
    touch_type: str = "click",
    convert_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_ms",
    id_col: str = "event_id",
) -> DataFrame:
    """Multi-touch journey summary per conversion: FIRST prior touch
    (first-click credit), LAST prior touch (last-click credit), the
    number of prior touches and the journey span — the table that
    decides whether first- and last-touch reports can disagree (they do
    exactly when ``n_prior_touches > 1`` and the endpoints differ).
    Complements :func:`last_touch_attribution` (single-model view).

    Scale shape: identical to last-touch — ONE shuffle on the user key;
    first/last/count all ride the SAME running ROWS frame ending
    1 PRECEDING (one window sort, three frame aggregates), no self-join.
    ``F.count`` over the CASE column skips nulls, so it counts touches
    only. Integer-only output."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_id = F.when(F.col(type_col) == touch_type, F.col(id_col))
    touch_ts = F.when(F.col(type_col) == touch_type, F.col(ts_col))
    out = (
        events.withColumn("first_touch_id", F.first(touch_id, True).over(w))
        .withColumn("last_touch_id", F.last(touch_id, True).over(w))
        .withColumn("first_touch_ts", F.first(touch_ts, True).over(w))
        .withColumn("last_touch_ts", F.last(touch_ts, True).over(w))
        .withColumn("n_prior_touches", F.count(touch_id).over(w))
        .filter(
            (F.col(type_col) == convert_type)
            & F.col("first_touch_id").isNotNull()
        )
    )
    return out.select(
        F.col(id_col).cast("long").alias("convert_event_id"),
        F.col(user_col).cast("long").alias("user_id"),
        F.col("first_touch_id").cast("long").alias("first_touch_id"),
        F.col("last_touch_id").cast("long").alias("last_touch_id"),
        F.col("n_prior_touches").cast("long").alias("n_prior_touches"),
        (F.col("last_touch_ts") - F.col("first_touch_ts"))
        .cast("long")
        .alias("journey_span_ms"),
        F.expr(
            "cast(case when first_touch_id = last_touch_id then 0 else 1 end"
            " as bigint)"
        ).alias("is_multi_path"),
    )


def touch_journey_sql(
    events_cte: str,
    touch_type: str = "click",
    convert_type: str = "purchase",
) -> str:
    """DuckDB twin of :func:`touch_journey`. ``events_cte`` must select
    (user_id, event_id, event_type, ts_ms)."""
    frame = (
        "partition by user_id order by ts_ms, event_id "
        "rows between unbounded preceding and 1 preceding"
    )
    tid = f"case when event_type = '{touch_type}' then event_id end"
    tts = f"case when event_type = '{touch_type}' then ts_ms end"
    return f"""
with ev as ({events_cte}),
t as (
  select user_id, event_id, event_type, ts_ms,
         first_value({tid} ignore nulls) over ({frame}) as first_touch_id,
         last_value({tid} ignore nulls) over ({frame}) as last_touch_id,
         first_value({tts} ignore nulls) over ({frame}) as first_touch_ts,
         last_value({tts} ignore nulls) over ({frame}) as last_touch_ts,
         count({tid}) over ({frame}) as n_prior_touches
  from ev
)
select event_id::BIGINT as convert_event_id, user_id::BIGINT as user_id,
       first_touch_id::BIGINT as first_touch_id,
       last_touch_id::BIGINT as last_touch_id,
       n_prior_touches::BIGINT as n_prior_touches,
       (last_touch_ts - first_touch_ts)::BIGINT as journey_span_ms,
       (case when first_touch_id = last_touch_id then 0 else 1 end)::BIGINT
         as is_multi_path
from t
where event_type = '{convert_type}' and first_touch_id is not null
"""
