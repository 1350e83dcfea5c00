"""events family query builders + DuckDB oracles (mechanically split from the catalog monolith)."""

from __future__ import annotations
from collections.abc import Callable
from dataclasses import dataclass
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..functions.urls import canonicalize_col, host_col
from ..operators import dedup, multimodal, similarity
from ..operators.labeling import label_row
from ..operators.comment_tree import reply_forest
from ..operators.ordering import assign_seq_scalable
from ..operators.robots import apply_robots
from ..operators.scheduler import admit
from ..operators.seen import anti_join_seen
from ..operators.stats import (
    attach_notes_with_misses,
    count_histogram,
    note_type_col,
    orphan_metrics,
)
from ..operators.textstats import (
    fingerprint_cols,
    lang_id_col,
    quality_score_cols,
    token_count_cols,
)
from ..plans.crawl import seeds_to_frontier
from ._shared import (
    _CORR_PROJ,
    _DEG_BUCKET_CASE,
    _t,
)



def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event sessionization: gap > 30 min starts a new session (lag +
    running sum — the stateful-stream analog expressed as batch windows)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "ts_ms", F.unix_millis(F.col("ts").cast("timestamp"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts_ms") - F.lag("ts_ms").over(w)
    flagged = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 30 * 60 * 1000), 1).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_sess").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


SQL_SESSIONIZATION = """
with g as (
  select user_id,
         epoch_ms(ts) - epoch_ms(lag(ts) over (partition by user_id order by ts, event_id)) as gap
  from events
)
select user_id,
  sum(case when gap is null or gap > 1800000 then 1 else 0 end)::BIGINT as n_sessions,
  count(*)::BIGINT as n_events
from g group by 1
"""


# ---------------------------------------------------------------------------
# session-6: events OLAP, embedding outliers, link co-citation, keep-alive
# planning, curriculum ordering, mixed-language + per-host boilerplate audits
# ---------------------------------------------------------------------------

_EVENTS_MS_CTE = (
    "select user_id, event_id, event_type, epoch_ms(ts) as ts_ms from events"
)


def _events_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    )


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (operators/events.funnel) over the event
    stream: per step, users who reached it IN ORDER (a click counts only
    at-or-after that user's first view, a purchase only after a qualified
    click) + conversion ppm vs the previous step. One shuffle on user_id;
    the stacked running-min windows share one sort; integer-only output."""
    from ..operators.events import funnel

    return funnel(_events_ms(spark, sf_dir))


def _sql_event_funnel() -> str:
    from ..operators.events import funnel_sql

    return funnel_sql(_EVENTS_MS_CTE)


def q_event_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention (operators/events.cohort_retention): users
    bucketed by first-seen week, counted in each later active week. The
    matrix is bounded by the calendar span squared, never the corpus; the
    cohort attach joins on the key both aggregates shuffled on."""
    from ..operators.events import cohort_retention

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    )
    return cohort_retention(ev)


def _sql_event_cohort_retention() -> str:
    from ..operators.events import cohort_retention_sql

    return cohort_retention_sql(
        "select user_id, epoch_ms(ts) as ts_ms from events"
    )


# ---------------------------------------------------------------------------
# session-7 operators
# ---------------------------------------------------------------------------


def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transitions over the per-user event stream
    (operators/events.transition_matrix): (prev -> next) counts and
    per-prev probability ppm. One shuffle on user_id for the lag window;
    the per-prev totals ride a window over the |types|^2-bounded pair
    aggregate, never the stream. Integer-only output."""
    from ..operators.events import transition_matrix

    return transition_matrix(_events_ms(spark, sf_dir))


def _sql_event_transition_matrix() -> str:
    from ..operators.events import transition_matrix_sql

    return transition_matrix_sql(_EVENTS_MS_CTE)


def q_event_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-median spike detection (operators/events.daily_anomaly)
    on the per-(type, day) event-volume series: day count > 2x the lower
    median of the previous <=7 observed days. The series is bounded by
    types x calendar span, so the window never sees the stream."""
    from ..operators.events import daily_anomaly

    return daily_anomaly(
        _t(spark, sf_dir, "events").select(
            "event_type",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        )
    )


def _sql_event_daily_anomaly() -> str:
    from ..operators.events import daily_anomaly_sql

    return daily_anomaly_sql(
        "select event_type, epoch_ms(ts) as ts_ms from events"
    )


#: bot-plant: every 11th user's timestamps are rewritten to a perfect
#: 1000 ms metronome (rank within user x 1000) — cv^2 = 0 exactly
_BOT_EVENTS_CTE = """select user_id, event_id, event_type,
  case when user_id % 11 = 0
       then user_id * 100000 + rn * 1000
       else ts_ms end as ts_ms
from (
  select user_id, event_id, event_type, epoch_ms(ts) as ts_ms,
         row_number() over (partition by user_id order by event_id) as rn
  from events
)"""


def q_event_bot_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metronome-bot detection (operators/events.bot_detect): users whose
    inter-arrival gaps have cv^2 < 0.1 — integer-moment test on exact
    DECIMAL sums, one shuffle on the user key. The planted every-11th
    metronome users (exact 1000 ms gaps) flag; bursty humans don't."""
    from ..operators.events import bot_detect

    w = Window.partitionBy("user_id").orderBy("event_id")
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.row_number().over(w).alias("rn"),
    )
    planted = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.when(
            F.col("user_id") % 11 == 0,
            F.col("user_id") * 100000 + F.col("rn") * 1000,
        )
        .otherwise(F.col("ts_ms"))
        .alias("ts_ms"),
    )
    return bot_detect(planted, min_events=10)


def _sql_event_bot_detect() -> str:
    from ..operators.events import bot_detect_sql

    return bot_detect_sql(_BOT_EVENTS_CTE, min_events=10)


def q_event_churn_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churned-user detection: users whose LAST event is more than 12
    HOURS before the stream's horizon (global max ts) — the synthetic
    events table spans 30 days with near-continuously-active users, so
    the churn gate is hour-granular to actually select rows (a day-scale
    threshold is trivially empty on this corpus; at production scale the
    constant is a config). One groupBy on user_id; the horizon is a
    1-row aggregate attached via the accepted single-row cross join.
    Integer-only output (hours inactive)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    )
    last = ev.groupBy("user_id").agg(F.max("ts_ms").alias("last_ms"))
    horizon = ev.agg(F.max("ts_ms").alias("h_ms"))
    hour = 3600000
    j = last.crossJoin(horizon)
    return (
        j.withColumn(
            "hours_inactive",
            F.expr(f"(h_ms - last_ms) div cast({hour} as bigint)"),
        )
        .filter(F.col("hours_inactive") > 12)
        .select(
            "user_id",
            F.col("hours_inactive").cast("long").alias("hours_inactive"),
        )
    )


SQL_EVENT_CHURN_DETECT = """
with ev as (select user_id, epoch_ms(ts) as ts_ms from events),
last as (select user_id, max(ts_ms) as last_ms from ev group by user_id),
horizon as (select max(ts_ms) as h_ms from ev)
select user_id,
       ((h_ms - last_ms) // 3600000)::BIGINT as hours_inactive
from last, horizon
where (h_ms - last_ms) // 3600000 > 12
"""


def q_event_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap histogram (operators/events.gap_histogram): the
    per-user consecutive-gap distribution over a fixed dyadic bucket
    ladder — human cadence vs scripted bursts vs batch replays. One
    shuffle on the user key; gaps collapse map-side into <= 6 rows;
    integer-only output from literals shared with the SQL twin."""
    from ..operators.events import gap_histogram

    return gap_histogram(_events_ms(spark, sf_dir))


def _sql_event_gap_histogram() -> str:
    from ..operators.events import gap_histogram_sql

    return gap_histogram_sql(_EVENTS_MS_CTE)


def q_event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution (operators/events.last_touch_attribution):
    every purchase attributed to the user's most recent STRICTLY-PRIOR
    click via a running ignore-nulls last() over an explicit ROWS frame
    ending 1 PRECEDING — one shuffle, no self-join, integer output."""
    from ..operators.events import last_touch_attribution

    return last_touch_attribution(_events_ms(spark, sf_dir))


def _sql_event_attribution() -> str:
    from ..operators.events import last_touch_attribution_sql

    return last_touch_attribution_sql(_EVENTS_MS_CTE)


def q_event_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence lift (market-basket affinity over the
    event log): for each type pair, P(user does both) / (P(a) * P(b)) —
    the signal behind "users who error also churn" dashboards. Shape: the
    distinct (user, type) table is persisted ONCE and used as both
    self-join sides (the r3 union/self-join lesson); per-user fan-out is
    bounded by the TYPE VOCABULARY (choose-2 of ~5), never the event
    count; the per-type totals and the single-row user count attach by
    broadcast (provably bounded dims). lift in exact integer ppm by
    cross-multiplication — no doubles."""
    from ..caching import track_persist

    ev = _t(spark, sf_dir, "events")
    ut = track_persist(ev.select("user_id", "event_type").distinct())
    nt = ut.groupBy("event_type").agg(F.count("*").cast("long").alias("n_t"))
    nu = ut.select("user_id").distinct().agg(
        F.count("*").cast("long").alias("n_users")
    )
    pairs = (
        ut.alias("a")
        .join(ut.alias("b"), "user_id")
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    na = nt.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("n_a"))
    nb = nt.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .crossJoin(F.broadcast(nu))
        .selectExpr(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            "cast((n_both * n_users * cast(1000000 as bigint))"
            " div (n_a * n_b) as bigint) as lift_ppm",
        )
    )


SQL_EVENT_TYPE_AFFINITY = """
with ut as (select distinct user_id, event_type from events),
nt as (select event_type, count(*)::BIGINT as n_t from ut group by 1),
nu as (select count(distinct user_id)::BIGINT as n_users from ut),
pairs as (
  select a.event_type as type_a, b.event_type as type_b,
         count(*)::BIGINT as n_both
  from ut a join ut b
    on a.user_id = b.user_id and a.event_type < b.event_type
  group by 1, 2
)
select type_a, type_b, ta.n_t as n_a, tb.n_t as n_b, n_both,
       ((n_both * n_users * 1000000) // (ta.n_t * tb.n_t))::BIGINT as lift_ppm
from pairs
join nt ta on pairs.type_a = ta.event_type
join nt tb on pairs.type_b = tb.event_type
cross join nu
"""


#: RFM tier ladders — shared text; recency/freq are BIGINT, msum is the
#: exact DECIMAL(18,4) per-user sum (decimal-vs-integer comparison is exact
#: in both engines)
_RFM_R = "case when recency_days <= 0 then 3 when recency_days <= 1 then 2 else 1 end"
_RFM_F = "case when freq >= 70 then 3 when freq >= 55 then 2 else 1 end"
_RFM_M = "case when msum >= 3600 then 3 when msum >= 2800 then 2 else 1 end"
_RFM_SEG = (
    f"concat('R', cast({_RFM_R} as varchar(2)),"
    f" 'F', cast({_RFM_F} as varchar(2)),"
    f" 'M', cast({_RFM_M} as varchar(2)))"
)


def q_event_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) user segmentation — the
    classic retention OLAP cube: each user lands in one of 27 tiers and
    the output is the segment rollup a lifecycle dashboard reads. Shape:
    ONE groupBy on user computes all three facets (map-side partials);
    the corpus-max timestamp attaches as the accepted 1-row broadcast;
    the 27-row segment rollup is a second bounded aggregate. Float
    parity: monetary sums as DECIMAL(18,4) (exact, associative), tiers
    compare decimal to integer literals, and the emitted cents are
    floor(decimal * 100) — never a double."""
    from ..caching import track_persist

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    # persisted ONCE: per_user feeds both the global-max derivation and the
    # tier projection — without the pin the aggregation job runs twice
    # (the r3 self-reference re-run lesson)
    per_user = track_persist(
        ev.groupBy("user_id").agg(
            F.max("ts_ms").alias("last_ms"),
            F.count("*").cast("long").alias("freq"),
            F.sum("v").alias("msum"),
        )
    )
    gmax = per_user.agg(F.max("last_ms").alias("gmax_ms"))
    tiers = per_user.crossJoin(F.broadcast(gmax)).selectExpr(
        "cast((gmax_ms - last_ms) div 86400000 as bigint) as recency_days",
        "freq",
        "msum",
    )
    seg = tiers.selectExpr(
        f"{_RFM_SEG} as segment",
        "freq",
        "cast(floor(msum * 100) as bigint) as u_cents",
    )
    return seg.groupBy("segment").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("freq").cast("long").alias("n_events"),
        F.sum("u_cents").cast("long").alias("value_cents"),
    )


SQL_EVENT_RFM_SEGMENTS = f"""
with ev as (
  select user_id, epoch_ms(ts) as ts_ms, value::DECIMAL(18,4) as v
  from events
),
per_user as (
  select user_id, max(ts_ms) as last_ms, count(*)::BIGINT as freq,
         sum(v) as msum
  from ev group by user_id
),
gmax as (select max(last_ms) as gmax_ms from per_user),
tiers as (
  select ((gmax_ms - last_ms) // 86400000)::BIGINT as recency_days,
         freq, msum
  from per_user cross join gmax
),
seg as (
  select {_RFM_SEG} as segment, freq,
         cast(floor(msum * 100) as bigint) as u_cents
  from tiers
)
select segment, count(*)::BIGINT as n_users, sum(freq)::BIGINT as n_events,
       sum(u_cents)::BIGINT as value_cents
from seg group by segment
"""


def q_event_session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session-opening paths: sessionize (30-min gap), take each
    session's first three event types in order, and rank the most common
    openings — the "how do sessions start" product query. Shape: the gap
    flag, the running session id (explicit ROWS frame) and the in-session
    row_number all sort under ONE hash exchange on user_id
    (HashPartitioning(user) satisfies the (user, sess) clustering); the
    path pivot is a max-CASE groupBy (concat_ws skips NULLs identically
    in both engines — short sessions keep short paths); the final global
    window ranks the |types|^3-BOUNDED path rollup, never event rows."""
    ev = _events_ms(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    gap = F.col("ts_ms") - F.lag("ts_ms").over(w)
    flagged = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800000), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ws = Window.partitionBy("user_id", "sess_id").orderBy("ts_ms", "event_id")
    first3 = sess.withColumn("rn", F.row_number().over(ws)).filter(
        F.col("rn") <= 3
    )
    paths = first3.groupBy("user_id", "sess_id").agg(
        F.concat_ws(
            ">",
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))),
            F.max(F.when(F.col("rn") == 2, F.col("event_type"))),
            F.max(F.when(F.col("rn") == 3, F.col("event_type"))),
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(
        F.count("*").cast("long").alias("n_sessions")
    )
    wr = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return counts.withColumn(
        "rank", F.row_number().over(wr).cast("long")
    ).filter(F.col("rank") <= 10)


SQL_EVENT_SESSION_PATH_TOPK = f"""
with e as ({_EVENTS_MS_CTE}),
g as (
  select user_id, event_id, event_type, ts_ms,
         ts_ms - lag(ts_ms) over (
           partition by user_id order by ts_ms, event_id
         ) as gap
  from e
),
flagged as (
  select *, case when gap is null or gap > 1800000 then 1 else 0 end
    as new_sess
  from g
),
s as (
  select *, sum(new_sess) over (
    partition by user_id order by ts_ms, event_id
    rows between unbounded preceding and current row
  ) as sess_id
  from flagged
),
f as (
  select *, row_number() over (
    partition by user_id, sess_id order by ts_ms, event_id
  ) as rn
  from s
),
p as (
  select user_id, sess_id,
         concat_ws('>',
           max(case when rn = 1 then event_type end),
           max(case when rn = 2 then event_type end),
           max(case when rn = 3 then event_type end)) as path
  from f where rn <= 3 group by user_id, sess_id
),
c as (select path, count(*)::BIGINT as n_sessions from p group by path),
r as (
  select *, row_number() over (order by n_sessions desc, path asc) as rank
  from c
)
select path, n_sessions, rank::BIGINT as rank from r where rank <= 10
"""


def q_event_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — the engagement ratio every product
    dashboard tracks: distinct users active on day d over distinct users
    active in the trailing 7-day window [d-6, d]. Shape: the distinct
    (user, day) table is persisted ONCE (it feeds both aggregates); the
    trailing window is NOT a range join (a broadcast inequality join goes
    nested-loop) — each (user, day) row instead EMITS its 7 target days
    via one explode(sequence(0, 6)), so WAU is a plain equi-groupBy with
    map-side partials and fan-out exactly 7 at any corpus size. Days
    beyond the observed horizon drop on the inner join with the DAU
    table. Integer ppm output — no doubles."""
    from ..caching import track_persist

    ud = track_persist(
        _events_ms(spark, sf_dir)
        .selectExpr("user_id", "ts_ms div 86400000 as day")
        .distinct()
    )
    dau = ud.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    contrib = ud.select(
        "user_id",
        "day",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
    ).selectExpr("user_id", "day + off as wday")
    wau = contrib.groupBy("wday").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return (
        dau.join(wau, dau["day"] == wau["wday"])
        .selectExpr(
            "day",
            "dau",
            "wau",
            "cast((dau * cast(1000000 as bigint)) div wau as bigint)"
            " as stickiness_ppm",
        )
    )


SQL_EVENT_STICKINESS = """
with e as (select user_id, epoch_ms(ts) // 86400000 as day from events),
ud as (select distinct user_id, day from e),
dau as (select day, count(*)::BIGINT as dau from ud group by day),
contrib as (select user_id, day + off as wday from ud, range(0, 7) as t(off)),
wau as (
  select wday, count(distinct user_id)::BIGINT as wau
  from contrib group by wday
)
select day::BIGINT as day, dau, wau,
       ((dau * 1000000) // wau)::BIGINT as stickiness_ppm
from dau join wau on dau.day = wau.wday
"""


def q_event_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the capacity-planning number
    behind connection pools and autoscaling: sessionize (30-min gap),
    clamp each session to the days it spans, sweep +1/-1 boundary deltas
    in time order and take the daily max of the running sum. Shape: ONE
    explode emits both deltas per session-day (the union-embeds lesson;
    day spans via sequence — Spark-inclusive, mirrored as range(d0, d1+1)
    in DuckDB); the delta table persists once and the running sum is
    TWO-PHASE — a within-(day, hour) window plus broadcast per-hour
    offsets from the <=25-row-per-day hour rollup — so no task ever sorts
    a full day (hour is monotone in ts, so local-rank + offset equals the
    per-day prefix sum exactly). The daily MAX is invariant to tie order
    among equal (ts, delta) rows: +1s sort before -1s, and within a +1
    block the prefix is monotone. Closed intervals: a session ending at
    the same ms another starts counts both."""
    from ..caching import track_persist

    ev = _events_ms(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    gap = F.col("ts_ms") - F.lag("ts_ms").over(w)
    flagged = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800000), 1).otherwise(0)
    )
    sess_rows = flagged.withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sessions = sess_rows.groupBy("user_id", "sess_id").agg(
        F.min("ts_ms").alias("st"), F.max("ts_ms").alias("en")
    )
    spanned = sessions.select(
        "user_id",
        "sess_id",
        "st",
        "en",
        F.explode(
            F.sequence(
                F.expr("st div 86400000"), F.expr("en div 86400000")
            )
        ).alias("day"),
    )
    deltas = track_persist(
        spanned.select(
            "user_id",
            "sess_id",
            "day",
            F.explode(
                F.array(
                    F.struct(
                        F.expr("greatest(st, day * 86400000)").alias("ts"),
                        F.lit(1).alias("delta"),
                    ),
                    F.struct(
                        F.expr(
                            "least(en, day * 86400000 + 86399999) + 1"
                        ).alias("ts"),
                        F.lit(-1).alias("delta"),
                    ),
                )
            ).alias("d"),
        ).select(
            "user_id",
            "sess_id",
            "day",
            F.col("d.ts").alias("ts"),
            F.col("d.delta").alias("delta"),
        )
    )
    hourly = deltas.withColumn(
        "hour", F.expr("(ts - day * 86400000) div 3600000")
    )
    wh = (
        Window.partitionBy("day", "hour")
        .orderBy(
            F.asc("ts"), F.desc("delta"), F.asc("user_id"), F.asc("sess_id")
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = hourly.withColumn("rs", F.sum("delta").over(wh))
    ht = hourly.groupBy("day", "hour").agg(F.sum("delta").alias("hs"))
    wo = (
        Window.partitionBy("day")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = ht.withColumn(
        "off", F.coalesce(F.sum("hs").over(wo), F.lit(0))
    ).select("day", "hour", "off")
    running = local.join(F.broadcast(offsets), ["day", "hour"]).withColumn(
        "running", F.col("off") + F.col("rs")
    )
    return running.groupBy("day").agg(
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_sessions"),
        F.max("running").cast("long").alias("peak"),
    )


SQL_EVENT_CONCURRENCY_PEAK = f"""
with e as ({_EVENTS_MS_CTE}),
g as (
  select user_id, event_id, ts_ms,
         ts_ms - lag(ts_ms) over (
           partition by user_id order by ts_ms, event_id
         ) as gap
  from e
),
flagged as (
  select *, case when gap is null or gap > 1800000 then 1 else 0 end
    as new_sess
  from g
),
s as (
  select *, sum(new_sess) over (
    partition by user_id order by ts_ms, event_id
    rows between unbounded preceding and current row
  ) as sess_id
  from flagged
),
sess as (
  select user_id, sess_id, min(ts_ms) as st, max(ts_ms) as en
  from s group by user_id, sess_id
),
spanned as (
  select user_id, sess_id, st, en,
         unnest(range(st // 86400000, en // 86400000 + 1)) as day
  from sess
),
del as (
  select user_id, sess_id, day, greatest(st, day * 86400000) as ts,
         1 as delta
  from spanned
  union all
  select user_id, sess_id, day,
         least(en, day * 86400000 + 86399999) + 1 as ts, -1 as delta
  from spanned
),
run as (
  select day, delta, sum(delta) over (
    partition by day
    order by ts asc, delta desc, user_id asc, sess_id asc
    rows between unbounded preceding and current row
  ) as running
  from del
)
select day::BIGINT as day,
       sum(case when delta = 1 then 1 else 0 end)::BIGINT as n_sessions,
       max(running)::BIGINT as peak
from run group by day
"""


def q_event_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type dwell time — how long users linger on each step
    before their next action (the engagement metric behind "views hold
    attention, errors bounce"): dwell = lead(ts) - ts within the user's
    stream, attributed to the CURRENT event's type, session-bounded (gaps
    > 30 min are session ends, not dwells — dropped). One shuffle on
    user_id for the lead window, then a bounded per-type rollup. Median
    interpolates identically in both engines (BIGINT ms inputs -> the
    .0/.5 midpoints are exact doubles); mean by integer division."""
    ev = _events_ms(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    dw = ev.withColumn("dwell", F.lead("ts_ms").over(w) - F.col("ts_ms")).filter(
        F.col("dwell").isNotNull() & (F.col("dwell") <= 1800000)
    )
    return dw.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_dwells"),
        F.median("dwell").alias("median_dwell_ms"),
        F.expr("sum(dwell) div count(*)").cast("long").alias("mean_dwell_ms"),
        F.max("dwell").cast("long").alias("max_dwell_ms"),
    )


SQL_EVENT_DWELL_TIME = f"""
with e as ({_EVENTS_MS_CTE}),
d as (
  select event_type,
         lead(ts_ms) over (
           partition by user_id order by ts_ms, event_id
         ) - ts_ms as dwell
  from e
)
select event_type, count(*)::BIGINT as n_dwells,
       median(dwell) as median_dwell_ms,
       (sum(dwell) // count(*))::BIGINT as mean_dwell_ms,
       max(dwell)::BIGINT as max_dwell_ms
from d where dwell is not null and dwell <= 1800000
group by event_type
"""


def q_event_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality per event type: observed count vs the
    independence expectation from the marginals, as integer lift ppm —
    the load-shaping signal a crawler/ingest scheduler reads to place
    heavy batch work in the traffic trough. Shape: ONE groupBy builds the
    |types| x 24 cell table, persisted once; ALL marginals (per-type,
    per-hour, grand total) derive from that bounded rollup — the event
    log is scanned exactly once — and attach by broadcast. lift_ppm =
    n * total * 1e6 div (type_total * hour_total), exact
    cross-multiplication (no doubles)."""
    from ..caching import track_persist

    ev = _events_ms(spark, sf_dir).selectExpr(
        "event_type", "(ts_ms div 3600000) % 24 as hour"
    )
    cells = track_persist(
        ev.groupBy("event_type", "hour").agg(
            F.count("*").cast("long").alias("n")
        )
    )
    nt = cells.groupBy("event_type").agg(F.sum("n").cast("long").alias("n_type"))
    nh = cells.groupBy("hour").agg(F.sum("n").cast("long").alias("n_hour"))
    tot = cells.agg(F.sum("n").cast("long").alias("total"))
    return (
        cells.join(F.broadcast(nt), "event_type")
        .join(F.broadcast(nh), "hour")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "event_type",
            "hour",
            "n",
            "cast((n * total * cast(1000000 as bigint))"
            " div (n_type * n_hour) as bigint) as lift_ppm",
        )
    )


SQL_EVENT_HOURLY_SEASONALITY = f"""
with e as (
  select event_type, (epoch_ms(ts) // 3600000) % 24 as hour from events
),
cells as (
  select event_type, hour, count(*)::BIGINT as n from e group by 1, 2
),
nt as (select event_type, sum(n)::BIGINT as n_type from cells group by 1),
nh as (select hour, sum(n)::BIGINT as n_hour from cells group by 1),
tot as (select sum(n)::BIGINT as total from cells)
select event_type, hour::BIGINT as hour, n,
       ((n * total * 1000000) // (n_type * n_hour))::BIGINT as lift_ppm
from cells
join nt using (event_type)
join nh using (hour)
cross join tot
"""


#: A/B variant from the stringified props field (the props_extract parse),
#: metric = the event value as exact DECIMAL cents
_AB_VARIANT_EXPR = "regexp_extract(props, '([0-9]+)', 1)"


def q_event_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout per event type: split events into variants
    by the parity of the props key, compare mean event value, report the
    B-over-A lift — the analysis every experimentation platform runs on
    the event log. Shape: one groupBy on (type, variant) with map-side
    partials, then a max-CASE pivot over the 2-variant axis (bounded);
    the metric sums as DECIMAL(18,4) (exact, associative — the float
    parity recipe), means and lift are integer cents/ppm division. No
    per-row Python, no doubles anywhere."""
    ev = _t(spark, sf_dir, "events").selectExpr(
        "event_type",
        f"cast({_AB_VARIANT_EXPR} as bigint) % 2 as variant",
        "cast(value as decimal(18,4)) as v",
    )
    cells = ev.groupBy("event_type", "variant").agg(
        F.count("*").cast("long").alias("n"),
        F.expr("cast(floor(sum(v) * 100) as bigint)").alias("sum_cents"),
    )
    piv = cells.groupBy("event_type").agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 0, F.col("sum_cents"))).alias("s_a"),
        F.max(F.when(F.col("variant") == 1, F.col("sum_cents"))).alias("s_b"),
    )
    return piv.selectExpr(
        "event_type",
        "n_a",
        "n_b",
        "cast(s_a div n_a as bigint) as mean_a_cents",
        "cast(s_b div n_b as bigint) as mean_b_cents",
        "cast(((s_b div n_b) * cast(1000000 as bigint))"
        " div (s_a div n_a) as bigint) as lift_ppm",
    )


SQL_EVENT_AB_TEST = f"""
with ev as (
  select event_type,
         ({_AB_VARIANT_EXPR})::BIGINT % 2 as variant,
         value::DECIMAL(18,4) as v
  from events
),
cells as (
  select event_type, variant, count(*)::BIGINT as n,
         cast(floor(sum(v) * 100) as bigint) as sum_cents
  from ev group by 1, 2
),
piv as (
  select event_type,
         max(case when variant = 0 then n end) as n_a,
         max(case when variant = 1 then n end) as n_b,
         max(case when variant = 0 then sum_cents end) as s_a,
         max(case when variant = 1 then sum_cents end) as s_b
  from cells group by event_type
)
select event_type, n_a, n_b,
       (s_a // n_a)::BIGINT as mean_a_cents,
       (s_b // n_b)::BIGINT as mean_b_cents,
       (((s_b // n_b) * 1000000) // (s_a // n_a))::BIGINT as lift_ppm
from piv
"""


#: session-duration dyadic ladder (ms bounds) — shared CASE text
_SESS_DUR_CASE = (
    "case when {d} = 0 then 0"
    " when {d} <= 60000 then 1"
    " when {d} <= 300000 then 2"
    " when {d} <= 900000 then 3"
    " when {d} <= 3600000 then 4"
    " else 5 end"
)


def q_event_session_duration_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Session-duration histogram over the 30-min-gap sessionization:
    singleton / <=1 min / <=5 / <=15 / <=60 / longer — the engagement
    depth distribution behind bounce-rate dashboards, and the batch twin
    of the streaming session_window tier (streaming/sessionize.py). One
    user-key shuffle builds sessions; durations collapse map-side into
    <=6 rows; integer ppm."""
    ev = _events_ms(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    gap = F.col("ts_ms") - F.lag("ts_ms").over(w)
    sess_rows = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800000), 1).otherwise(0)
    ).withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    dur = sess_rows.groupBy("user_id", "sess_id").agg(
        (F.max("ts_ms") - F.min("ts_ms")).alias("dur_ms"),
        F.count("*").cast("long").alias("n_events"),
    )
    b = dur.selectExpr(
        f"cast({_SESS_DUR_CASE.format(d='dur_ms')} as bigint) as bucket",
        "dur_ms",
        "n_events",
    )
    agg = b.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.max("dur_ms").cast("long").alias("max_dur_ms"),
    )
    wt = Window.partitionBy()
    return agg.withColumn("__tot", F.sum("n_sessions").over(wt)).selectExpr(
        "bucket",
        "n_sessions",
        "n_events",
        "max_dur_ms",
        "cast((n_sessions * cast(1000000 as bigint)) div __tot as bigint)"
        " as share_ppm",
    )


SQL_EVENT_SESSION_DURATION_HISTOGRAM = f"""
with e as ({_EVENTS_MS_CTE}),
g as (
  select user_id, event_id, ts_ms,
         ts_ms - lag(ts_ms) over (
           partition by user_id order by ts_ms, event_id
         ) as gap
  from e
),
s as (
  select *, sum(case when gap is null or gap > 1800000 then 1 else 0 end)
    over (partition by user_id order by ts_ms, event_id
          rows between unbounded preceding and current row) as sess_id
  from g
),
dur as (
  select user_id, sess_id, max(ts_ms) - min(ts_ms) as dur_ms,
         count(*)::BIGINT as n_events
  from s group by user_id, sess_id
),
b as (
  select ({_SESS_DUR_CASE.format(d='dur_ms')})::BIGINT as bucket,
         dur_ms, n_events
  from dur
),
agg as (
  select bucket, count(*)::BIGINT as n_sessions,
         sum(n_events)::BIGINT as n_events,
         max(dur_ms)::BIGINT as max_dur_ms
  from b group by bucket
)
select bucket, n_sessions, n_events, max_dur_ms,
       ((n_sessions * 1000000) // (sum(n_sessions) over ()))::BIGINT
         as share_ppm
from agg
"""


def q_event_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting per day: new users (first ever appearance) vs
    returning — the acquisition/retention split every growth dashboard
    leads with. Shape: the distinct (user, day) table is persisted ONCE;
    first-seen is one groupBy on user; the new-flag attaches by equi-join
    on (user, first_day == day) — no window over the corpus; the daily
    rollup is bounded by the horizon. Integer ppm."""
    from ..caching import track_persist

    ud = track_persist(
        _events_ms(spark, sf_dir)
        .selectExpr("user_id", "ts_ms div 86400000 as day")
        .distinct()
    )
    first = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    flagged = ud.join(first, "user_id").withColumn(
        "is_new", (F.col("day") == F.col("first_day")).cast("long")
    )
    return (
        flagged.groupBy("day")
        .agg(
            F.sum("is_new").cast("long").alias("n_new"),
            F.sum(1 - F.col("is_new")).cast("long").alias("n_returning"),
        )
        .selectExpr(
            "day",
            "n_new",
            "n_returning",
            "cast((n_returning * cast(1000000 as bigint))"
            " div (n_new + n_returning) as bigint) as returning_ppm",
        )
    )


SQL_EVENT_NEW_VS_RETURNING = """
with e as (select user_id, epoch_ms(ts) // 86400000 as day from events),
ud as (select distinct user_id, day from e),
first as (select user_id, min(day) as first_day from ud group by user_id),
flagged as (
  select day, (case when day = first_day then 1 else 0 end)::BIGINT as is_new
  from ud join first using (user_id)
)
select day::BIGINT as day, sum(is_new)::BIGINT as n_new,
       sum(1 - is_new)::BIGINT as n_returning,
       ((sum(1 - is_new) * 1000000) // count(*))::BIGINT as returning_ppm
from flagged group by day
"""


def q_event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value percentiles (p50/p90/p99 + max) via DISCRETE
    order statistics — the tail-latency/basket-size readout. Same
    repr-safety argument as text_length_percentiles: percentile_disc
    RETURNS an existing input double (no interpolation arithmetic), so
    Spark and DuckDB emit bit-identical values even on a double metric
    column."""
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__events_vp")
    return spark.sql(
        """
select event_type, count(*) as n,
       percentile_disc(0.5) within group (order by value) as p50_value,
       percentile_disc(0.9) within group (order by value) as p90_value,
       percentile_disc(0.99) within group (order by value) as p99_value,
       max(value) as max_value
from __events_vp group by event_type
"""
    ).selectExpr(
        "event_type",
        "cast(n as bigint) as n",
        "p50_value",
        "p90_value",
        "p99_value",
        "max_value",
    )


SQL_EVENT_VALUE_PERCENTILES = """
select event_type, count(*)::BIGINT as n,
       quantile_disc(value, 0.5) as p50_value,
       quantile_disc(value, 0.9) as p90_value,
       quantile_disc(value, 0.99) as p99_value,
       max(value) as max_value
from events group by event_type
"""


def q_event_heavy_user_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-user concentration: per power-of-2 activity band (events per
    user), user count, event count and each band's share of all events —
    the "what fraction of traffic is power users" curve, computed WITHOUT
    any per-user ranking window (a groupBy on user, a bounded dyadic
    rollup, a 3-row share window — scale-perfect where a percentile rank
    over users would funnel). Complements event_rfm_segments (marketing
    tiers) with the raw concentration curve."""
    ev = _t(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count("*").cast("long").alias("n")
    )
    b = ev.selectExpr(
        f"cast({_DEG_BUCKET_CASE.format(d='n')} as bigint) as band", "n"
    )
    agg = b.groupBy("band").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("n").cast("long").alias("n_events"),
    )
    wt = Window.partitionBy()
    return agg.withColumn(
        "__tot", F.sum("n_events").over(wt)
    ).selectExpr(
        "band",
        "n_users",
        "n_events",
        "cast((n_events * cast(1000000 as bigint)) div __tot as bigint)"
        " as event_share_ppm",
    )


SQL_EVENT_HEAVY_USER_SHARE = f"""
with u as (select user_id, count(*)::BIGINT as n from events group by user_id),
b as (select ({_DEG_BUCKET_CASE.format(d='n')})::BIGINT as band, n from u),
agg as (
  select band, count(*)::BIGINT as n_users, sum(n)::BIGINT as n_events
  from b group by band
)
select band, n_users, n_events,
       ((n_events * 1000000) // (sum(n_events) over ()))::BIGINT
         as event_share_ppm
from agg
"""


def q_event_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic burstiness per event type — the Fano factor (variance /
    mean of per-minute arrival counts): ~1 for Poisson-like human
    traffic, >> 1 for bursty/batchy load, << 1 for metronome bots
    (complements event_bot_detect's per-user inter-arrival view with the
    AGGREGATE arrival process). Exact integer moments over the bounded
    (type, minute) rollup; fano_ppm = (n*S2 - S1^2) * 1e6 div (n * S1)
    by cross-multiplication — no doubles, no ln."""
    ev = _events_ms(spark, sf_dir).selectExpr(
        "event_type", "ts_ms div 60000 as minute"
    )
    cells = ev.groupBy("event_type", "minute").agg(
        F.count("*").cast("long").alias("c")
    )
    return cells.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_minutes"),
        F.sum("c").cast("long").alias("n_events"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    ).selectExpr(
        "event_type",
        "n_minutes",
        "n_events",
        "cast(((n_minutes * s2 - n_events * n_events)"
        " * cast(1000000 as bigint))"
        " div (n_minutes * n_events) as bigint) as fano_ppm",
    )


SQL_EVENT_BURSTINESS = """
with e as (
  select event_type, epoch_ms(ts) // 60000 as minute from events
),
cells as (
  select event_type, minute, count(*)::BIGINT as c
  from e group by event_type, minute
)
select event_type, count(*)::BIGINT as n_minutes,
       sum(c)::BIGINT as n_events,
       (((count(*) * sum(c * c) - sum(c) * sum(c)) * 1000000)
        // (count(*) * sum(c)))::BIGINT as fano_ppm
from cells group by event_type
"""


def q_event_cohort_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort VALUE matrix — the revenue twin of
    event_cohort_retention: users bucketed by first-seen week, their
    event value summed per later active week (the LTV-accumulation
    table). Shape: first-seen is one groupBy on user; the attach joins
    on the user key both aggregates shuffled on; the matrix is bounded
    by the calendar span squared. Float parity: value sums as
    DECIMAL(18,4) (exact, associative), emitted as floor cents."""
    WEEK = 604800000
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    ).withColumn("week", F.expr(f"ts_ms div {WEEK}"))
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    j = ev.join(first, "user_id")
    return (
        j.groupBy("cohort_week", "week")
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.expr("cast(floor(sum(v) * 100) as bigint)").alias("value_cents"),
        )
        .selectExpr(
            "cast(cohort_week as bigint) as cohort_week",
            "cast(week - cohort_week as bigint) as week_offset",
            "n_users",
            "value_cents",
        )
    )


SQL_EVENT_COHORT_VALUE = """
with ev as (
  select user_id, epoch_ms(ts) // 604800000 as week,
         value::DECIMAL(18,4) as v
  from events
),
first as (select user_id, min(week) as cohort_week from ev group by user_id)
select cohort_week::BIGINT as cohort_week,
       (week - cohort_week)::BIGINT as week_offset,
       count(distinct e.user_id)::BIGINT as n_users,
       cast(floor(sum(v) * 100) as bigint) as value_cents
from ev e join first using (user_id)
group by cohort_week, week
"""


_RESURRECT_GAP_DAYS = 14


def q_event_resurrection_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resurrected-user detection: per day, users who return after a
    >= 14-day absence — the comeback half of the lifecycle ledger
    (event_churn_detect flags the exits, event_new_vs_returning splits
    acquisition; this catches win-backs, which a plain DAU count hides
    inside 'returning'). One lag window on the distinct (user, day)
    table, a bounded per-day rollup; integer ppm vs that day's actives."""
    from ..caching import track_persist

    ud = track_persist(
        _events_ms(spark, sf_dir)
        .selectExpr("user_id", "ts_ms div 86400000 as day")
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    gaps = ud.withColumn("prev_day", F.lag("day").over(w)).withColumn(
        "is_resurrect",
        (
            F.col("prev_day").isNotNull()
            & (F.col("day") - F.col("prev_day") >= _RESURRECT_GAP_DAYS)
        ).cast("long"),
    )
    return gaps.groupBy("day").agg(
        F.count("*").cast("long").alias("n_active"),
        F.sum("is_resurrect").cast("long").alias("n_resurrected"),
    ).selectExpr(
        "day",
        "n_active",
        "n_resurrected",
        "cast((n_resurrected * cast(1000000 as bigint)) div n_active"
        " as bigint) as resurrect_ppm",
    )


SQL_EVENT_RESURRECTION_DETECT = f"""
with e as (select user_id, epoch_ms(ts) // 86400000 as day from events),
ud as (select distinct user_id, day from e),
g as (
  select user_id, day,
         lag(day) over (partition by user_id order by day) as prev_day
  from ud
),
f as (
  select day,
         (case when prev_day is not null
                    and day - prev_day >= {_RESURRECT_GAP_DAYS}
               then 1 else 0 end)::BIGINT as is_resurrect
  from g
)
select day::BIGINT as day, count(*)::BIGINT as n_active,
       sum(is_resurrect)::BIGINT as n_resurrected,
       ((sum(is_resurrect) * 1000000) // count(*))::BIGINT as resurrect_ppm
from f group by day
"""


def q_event_dau_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive DAU forecast backtest: predict each day's active users as
    the mean of the trailing <= 7 OBSERVED days and score the prediction
    — the baseline every fancier forecaster must beat, with its error
    ledger computed in the same query (ape_ppm = |actual - forecast| /
    actual). Shape: the per-day DAU rollup is bounded by the horizon, so
    the trailing window runs over days, never events; integer mean by
    div; days with no history emit no forecast row."""
    ud = (
        _events_ms(spark, sf_dir)
        .selectExpr("user_id", "ts_ms div 86400000 as day")
        .distinct()
    )
    dau = ud.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    w = Window.orderBy("day").rowsBetween(-7, -1)
    f = (
        dau.withColumn("__s", F.sum("dau").over(w))
        .withColumn("__c", F.count("dau").over(w))
        .filter(F.col("__c") > 0)
    )
    return f.selectExpr(
        "day",
        "dau",
        "cast(__s div __c as bigint) as forecast_dau",
    ).selectExpr(
        "day",
        "dau",
        "forecast_dau",
        "cast((abs(dau - forecast_dau) * cast(1000000 as bigint)) div dau"
        " as bigint) as ape_ppm",
    )


SQL_EVENT_DAU_FORECAST_BACKTEST = """
with e as (select user_id, epoch_ms(ts) // 86400000 as day from events),
ud as (select distinct user_id, day from e),
dau as (select day, count(*)::BIGINT as dau from ud group by day),
f as (
  select day, dau,
         sum(dau) over (order by day rows between 7 preceding
                        and 1 preceding) as s,
         count(dau) over (order by day rows between 7 preceding
                          and 1 preceding) as c
  from dau
)
select day::BIGINT as day, dau, (s // c)::BIGINT as forecast_dau,
       ((abs(dau - s // c) * 1000000) // dau)::BIGINT as ape_ppm
from f where c > 0
"""


def q_event_ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B significance readout: Welch z-score of the variant-B-vs-A mean
    value difference per event type — the go/no-go column the lift table
    (event_ab_test) lacks. Float parity recipe end to end: per-variant
    moments (sum v, sum v^2) accumulate as exact DECIMAL (associative,
    any fold order), the max-CASE pivot brings all eight moments onto ONE
    row, and the z-score is then a fixed shape of per-row double ops —
    +,-,*,/ and sqrt, all IEEE bit-stable (ln/pow stay banned) — with a
    floor-projected output (the round() tie trap). |z| >= 1.96 flags 95%
    significance."""
    ev = _t(spark, sf_dir, "events").selectExpr(
        "event_type",
        f"cast({_AB_VARIANT_EXPR} as bigint) % 2 as variant",
        "cast(value as decimal(18,4)) as v",
    )
    cells = ev.groupBy("event_type", "variant").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.expr("cast(v * v as decimal(38,8))")).alias("s2"),
    )
    piv = cells.groupBy("event_type").agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 0, F.col("s1"))).alias("s1_a"),
        F.max(F.when(F.col("variant") == 1, F.col("s1"))).alias("s1_b"),
        F.max(F.when(F.col("variant") == 0, F.col("s2"))).alias("s2_a"),
        F.max(F.when(F.col("variant") == 1, F.col("s2"))).alias("s2_b"),
    )
    z_expr = (
        "(cast(s1_b as double) / n_b - cast(s1_a as double) / n_a)"
        " / sqrt("
        "   (cast(s2_a as double) / n_a"
        "    - (cast(s1_a as double) / n_a) * (cast(s1_a as double) / n_a))"
        "   / n_a"
        " + (cast(s2_b as double) / n_b"
        "    - (cast(s1_b as double) / n_b) * (cast(s1_b as double) / n_b))"
        "   / n_b)"
    )
    return piv.selectExpr(
        "event_type",
        "n_a",
        "n_b",
        f"cast(floor(({z_expr}) * 1000) as bigint) as z_milli",
    ).selectExpr(
        "event_type",
        "n_a",
        "n_b",
        "z_milli",
        "cast(case when abs(z_milli) >= 1960 then 1 else 0 end as bigint)"
        " as significant_95",
    )


def _sql_event_ab_test_zscore() -> str:
    z_expr = (
        "(cast(s1_b as double) / n_b - cast(s1_a as double) / n_a)"
        " / sqrt("
        "   (cast(s2_a as double) / n_a"
        "    - (cast(s1_a as double) / n_a) * (cast(s1_a as double) / n_a))"
        "   / n_a"
        " + (cast(s2_b as double) / n_b"
        "    - (cast(s1_b as double) / n_b) * (cast(s1_b as double) / n_b))"
        "   / n_b)"
    )
    return f"""
with ev as (
  select event_type,
         ({_AB_VARIANT_EXPR})::BIGINT % 2 as variant,
         value::DECIMAL(18,4) as v
  from events
),
cells as (
  select event_type, variant, count(*)::BIGINT as n, sum(v) as s1,
         sum(cast(v * v as decimal(38,8))) as s2
  from ev group by 1, 2
),
piv as (
  select event_type,
         max(case when variant = 0 then n end) as n_a,
         max(case when variant = 1 then n end) as n_b,
         max(case when variant = 0 then s1 end) as s1_a,
         max(case when variant = 1 then s1 end) as s1_b,
         max(case when variant = 0 then s2 end) as s2_a,
         max(case when variant = 1 then s2 end) as s2_b
  from cells group by event_type
)
select event_type, n_a, n_b,
       cast(floor(({z_expr}) * 1000) as bigint) as z_milli,
       (case when abs(cast(floor(({z_expr}) * 1000) as bigint)) >= 1960
             then 1 else 0 end)::BIGINT as significant_95
from piv
"""


def q_event_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-activity streak distribution — the gaps-and-islands pattern:
    consecutive active days share the invariant (day - row_number) within
    a user, so one window + one groupBy finds every streak with no
    iteration (the engagement-streak widget, and the canonical SQL idiom
    for run-length analysis over sparse time series). Rollup per streak
    length: streak count, distinct users, plus each length's share. One
    shuffle on the user key; the length rollup is horizon-bounded.
    Integer ppm."""
    from ..caching import track_persist

    ud = track_persist(
        _events_ms(spark, sf_dir)
        .selectExpr("user_id", "ts_ms div 86400000 as day")
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    isl = ud.withColumn(
        "grp", F.col("day") - F.row_number().over(w)
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count("*").cast("long").alias("len")
    )
    agg = streaks.groupBy("len").agg(
        F.count("*").cast("long").alias("n_streaks"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    wt = Window.partitionBy()
    return agg.withColumn("__tot", F.sum("n_streaks").over(wt)).selectExpr(
        "len as streak_days",
        "n_streaks",
        "n_users",
        "cast((n_streaks * cast(1000000 as bigint)) div __tot as bigint)"
        " as share_ppm",
    )


SQL_EVENT_ACTIVITY_STREAKS = """
with e as (select user_id, epoch_ms(ts) // 86400000 as day from events),
ud as (select distinct user_id, day from e),
isl as (
  select user_id, day,
         day - row_number() over (partition by user_id order by day) as grp
  from ud
),
streaks as (
  select user_id, grp, count(*)::BIGINT as len
  from isl group by user_id, grp
),
agg as (
  select len, count(*)::BIGINT as n_streaks,
         count(distinct user_id)::BIGINT as n_users
  from streaks group by len
)
select len as streak_days, n_streaks, n_users,
       ((n_streaks * 1000000) // (sum(n_streaks) over ()))::BIGINT
         as share_ppm
from agg
"""


#: conversion-lag dyadic ladder (minutes)
_CONVLAG_CASE = (
    "case when {m} <= 1 then 0 when {m} <= 10 then 1 when {m} <= 60 then 2"
    " when {m} <= 1440 then 3 else 4 end"
)


def q_event_conversion_lag_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Time-to-convert distribution: for every user who both viewed and
    later purchased, the lag from FIRST view to FIRST purchase at-or-
    after it, in dyadic minute buckets — the funnel-velocity readout
    event_funnel's step counts lack. Shape: one groupBy per user pulls
    both firsts (min with CASE — no window), an inner filter keeps
    converters, the rollup is bucket-bounded. Integer ppm."""
    ev = _events_ms(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts_ms"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts_ms"))).alias(
            "first_purchase"
        ),
    )
    conv = per_user.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).selectExpr("(first_purchase - first_view) div 60000 as lag_min")
    b = conv.selectExpr(
        f"cast({_CONVLAG_CASE.format(m='lag_min')} as bigint) as bucket",
        "lag_min",
    )
    agg = b.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_users"),
        F.max("lag_min").cast("long").alias("max_lag_min"),
    )
    wt = Window.partitionBy()
    return agg.withColumn("__tot", F.sum("n_users").over(wt)).selectExpr(
        "bucket",
        "n_users",
        "max_lag_min",
        "cast((n_users * cast(1000000 as bigint)) div __tot as bigint)"
        " as share_ppm",
    )


SQL_EVENT_CONVERSION_LAG_HISTOGRAM = f"""
with e as ({_EVENTS_MS_CTE}),
per_user as (
  select user_id,
         min(case when event_type = 'view' then ts_ms end) as first_view,
         min(case when event_type = 'purchase' then ts_ms end)
           as first_purchase
  from e group by user_id
),
conv as (
  select (first_purchase - first_view) // 60000 as lag_min
  from per_user
  where first_view is not null and first_purchase is not null
    and first_purchase >= first_view
),
b as (
  select ({_CONVLAG_CASE.format(m='lag_min')})::BIGINT as bucket, lag_min
  from conv
),
agg as (
  select bucket, count(*)::BIGINT as n_users,
         max(lag_min)::BIGINT as max_lag_min
  from b group by bucket
)
select bucket, n_users, max_lag_min,
       ((n_users * 1000000) // (sum(n_users) over ()))::BIGINT as share_ppm
from agg
"""


def q_event_value_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration by value magnitude: events banded by the
    DIGIT COUNT of their cent value (an exact log10 ladder — integer
    string length, no ln), each band's event count, distinct spenders,
    and share of total revenue — the "do big-ticket events dominate?"
    readout complementing event_heavy_user_share's per-user activity
    curve. Cents are floor(DECIMAL(18,4) × 100) (the float-parity
    recipe); shares are integer ppm over a ≤6-row window. One scan, one
    bounded groupBy — no per-user or ranking window anywhere."""
    ev = _t(spark, sf_dir, "events").selectExpr(
        "user_id",
        "cast(floor(cast(value as decimal(18,4)) * 100) as bigint) as cents",
    )
    b = ev.selectExpr(
        "cast(length(cast(cents as string)) as bigint) as band",
        "user_id",
        "cents",
    )
    agg = b.groupBy("band").agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum("cents").cast("long").alias("value_cents"),
    )
    wt = Window.partitionBy()
    return agg.withColumn(
        "__tot", F.sum("value_cents").over(wt)
    ).selectExpr(
        "band",
        "n_events",
        "n_users",
        "value_cents",
        "cast((value_cents * cast(1000000 as bigint)) div __tot as bigint)"
        " as value_share_ppm",
    )


SQL_EVENT_VALUE_PARETO = """
with ev as (
  select user_id,
         cast(floor(value::DECIMAL(18,4) * 100) as bigint) as cents
  from events
),
b as (
  select length(cents::VARCHAR)::BIGINT as band, user_id, cents from ev
),
agg as (
  select band, count(*)::BIGINT as n_events,
         count(distinct user_id)::BIGINT as n_users,
         sum(cents)::BIGINT as value_cents
  from b group by band
)
select band, n_events, n_users, value_cents,
       ((value_cents * 1000000) // (sum(value_cents) over ()))::BIGINT
         as value_share_ppm
from agg
"""


# --- session-32: weekday profile, url extensions, touch journey,
#     freshness SLA -----------------------------------------------------------


def q_event_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday/weekend traffic split per event type with the weekend
    daily lift — the day-of-week seasonal axis that
    event_hourly_seasonality's |types|×24 hour rollup doesn't cover.
    Day-of-week is pure epoch arithmetic ((epoch_day + 3) % 7, Monday=0
    — epoch day 0 was a Thursday), never an engine date function (Spark
    dayofweek and DuckDB dayofweek disagree on the origin). The lift
    normalizes per-day: (n_weekend/2 days) / (n_weekday/5 days) in
    integer ppm. One scan, one bounded groupBy."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    )
    d = ev.selectExpr(
        "event_type",
        "cast((ts_ms div 86400000 + 3) % 7 as bigint) as dow",
    )
    agg = d.groupBy("event_type").agg(
        F.sum(F.expr("case when dow <= 4 then 1 else 0 end"))
        .cast("long")
        .alias("n_weekday"),
        F.sum(F.expr("case when dow >= 5 then 1 else 0 end"))
        .cast("long")
        .alias("n_weekend"),
    )
    return agg.selectExpr(
        "event_type",
        "n_weekday",
        "n_weekend",
        "cast((n_weekend * cast(5000000 as bigint))"
        " div nullif(n_weekday * cast(2 as bigint), 0) as bigint)"
        " as weekend_daily_lift_ppm",
    )


SQL_EVENT_WEEKDAY_PROFILE = """
with ev as (select event_type, epoch_ms(ts) as ts_ms from events),
d as (
  select event_type, ((ts_ms // 86400000 + 3) % 7)::BIGINT as dow from ev
),
agg as (
  select event_type,
         sum(case when dow <= 4 then 1 else 0 end)::BIGINT as n_weekday,
         sum(case when dow >= 5 then 1 else 0 end)::BIGINT as n_weekend
  from d group by event_type
)
select event_type, n_weekday, n_weekend,
       ((n_weekend * 5000000) // nullif(n_weekday * 2, 0))::BIGINT
         as weekend_daily_lift_ppm
from agg
"""


def q_event_touch_journey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution journey (operators/events.touch_journey):
    per conversion, FIRST and LAST prior click, prior-touch count and
    journey span — first-click and last-click credit from ONE window
    sort (three frame aggregates over the same ROWS frame ending
    1 PRECEDING), no self-join. The disagreement flag (is_multi_path)
    is the audit for whether the single-model event_attribution report
    under-credits discovery channels."""
    from ..operators.events import touch_journey

    return touch_journey(_events_ms(spark, sf_dir))


def _sql_event_touch_journey() -> str:
    from ..operators.events import touch_journey_sql

    return touch_journey_sql(_EVENTS_MS_CTE)


def q_event_type_share_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-mix drift: each type's traffic share in the first vs second
    half of the observation window (split at the midpoint of the
    min/max timestamp — pure epoch arithmetic) and the signed share
    delta — the monitoring table that catches instrumentation changes
    and product-mix shifts between corpus snapshots. Shape: one scan,
    a 1-row min/max broadcast, one bounded groupBy, ≤|types|-row share
    windows; all integer ppm."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    )
    span = ev.agg(
        F.min("ts_ms").alias("lo"), F.max("ts_ms").alias("hi")
    )
    half = ev.crossJoin(F.broadcast(span)).selectExpr(
        "event_type",
        "case when ts_ms * 2 < lo + hi then 0 else 1 end as h",
    )
    agg = half.groupBy("event_type").agg(
        F.sum(F.expr("case when h = 0 then 1 else 0 end"))
        .cast("long")
        .alias("n_first"),
        F.sum(F.expr("case when h = 1 then 1 else 0 end"))
        .cast("long")
        .alias("n_second"),
    )
    wt = Window.partitionBy()
    return (
        agg.withColumn("__t1", F.sum("n_first").over(wt))
        .withColumn("__t2", F.sum("n_second").over(wt))
        .selectExpr(
            "event_type",
            "n_first",
            "n_second",
            "cast((n_first * cast(1000000 as bigint)) div __t1 as bigint)"
            " as share_first_ppm",
            "cast((n_second * cast(1000000 as bigint)) div __t2 as bigint)"
            " as share_second_ppm",
            "cast((n_second * cast(1000000 as bigint)) div __t2"
            " - (n_first * cast(1000000 as bigint)) div __t1 as bigint)"
            " as drift_ppm",
        )
    )


SQL_EVENT_TYPE_SHARE_DRIFT = """
with ev as (select event_type, epoch_ms(ts) as ts_ms from events),
span as (select min(ts_ms) as lo, max(ts_ms) as hi from ev),
half as (
  select event_type,
         case when ts_ms * 2 < lo + hi then 0 else 1 end as h
  from ev cross join span
),
agg as (
  select event_type,
         sum(case when h = 0 then 1 else 0 end)::BIGINT as n_first,
         sum(case when h = 1 then 1 else 0 end)::BIGINT as n_second
  from half group by event_type
)
select event_type, n_first, n_second,
       ((n_first * 1000000) // (sum(n_first) over ()))::BIGINT
         as share_first_ppm,
       ((n_second * 1000000) // (sum(n_second) over ()))::BIGINT
         as share_second_ppm,
       ((n_second * 1000000) // (sum(n_second) over ())
        - (n_first * 1000000) // (sum(n_first) over ()))::BIGINT
         as drift_ppm
from agg
"""


def q_event_user_type_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral diversity via the Herfindahl index of the
    user's event-type distribution — HHI = Σ share² in exact integer
    ppm ((Σ n_t²)·10⁶ div n², no floats, no ln — the entropy twin the
    repr() gate can't accept). 10⁶ = single-type specialist, 10⁶/k =
    uniform over k types. Shape: one groupBy on (user, type) with
    map-side partials, one groupBy on user — the |types|-bounded cell
    table, never a per-event window."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("n_t")
    )
    return cells.groupBy("user_id").agg(
        F.sum("n_t").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_types"),
        F.expr(
            "cast((sum(n_t * n_t) * cast(1000000 as bigint))"
            " div (sum(n_t) * sum(n_t)) as bigint)"
        ).alias("hhi_ppm"),
    )


SQL_EVENT_USER_TYPE_DIVERSITY = """
with cells as (
  select user_id, event_type, count(*)::BIGINT as n_t
  from events group by user_id, event_type
)
select user_id, sum(n_t)::BIGINT as n_events,
       count(*)::BIGINT as n_types,
       ((sum(n_t * n_t) * 1000000) // (sum(n_t) * sum(n_t)))::BIGINT
         as hhi_ppm
from cells group by user_id
"""


def q_event_value_vs_activity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do active users spend more? ONE row: the Pearson correlation of
    (events per user, cents per user) over all users — the
    assortativity float-parity recipe applied to the commerce ledger:
    every moment is an INTEGER sum in DECIMAL(38,0) (exact,
    associative), the correlation is per-value double arithmetic + one
    sqrt (IEEE-correctly-rounded) over those exact moments, and the
    output is floor-projected (the round() tie trap). Shape: one
    groupBy on user, one global aggregate with map-side partials."""
    ev = _t(spark, sf_dir, "events").selectExpr(
        "user_id", "cast(value as decimal(18,4)) as v"
    )
    per = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("x"),
        F.expr("cast(floor(sum(v) * 100) as bigint)").alias("y"),
    )
    dec = "cast({e} as decimal(38,0))"
    agg = per.agg(
        F.count("*").alias("m"),
        F.sum(F.expr(dec.format(e="x"))).alias("sx"),
        F.sum(F.expr(dec.format(e="y"))).alias("sy"),
        F.sum(F.expr(dec.format(e="x * y"))).alias("sxy"),
        F.sum(F.expr(dec.format(e="x * x"))).alias("sxx"),
        F.sum(F.expr(dec.format(e="y * y"))).alias("syy"),
    )
    return agg.selectExpr(
        "cast(m as bigint) as n_users",
        *_CORR_PROJ,
    )

SQL_EVENT_VALUE_VS_ACTIVITY_CORR = f"""
with ev as (
  select user_id, value::DECIMAL(18,4) as v from events
),
per as (
  select user_id, count(*)::BIGINT as x,
         cast(floor(sum(v) * 100) as bigint) as y
  from ev group by user_id
),
agg as (
  select count(*) as m,
         sum(cast(x as decimal(38,0))) as sx,
         sum(cast(y as decimal(38,0))) as sy,
         sum(cast(x * y as decimal(38,0))) as sxy,
         sum(cast(x * x as decimal(38,0))) as sxx,
         sum(cast(y * y as decimal(38,0))) as syy
  from per
)
select cast(m as bigint) as n_users, {_CORR_PROJ[0]}
from agg
"""


#: power-iteration depth for the stationary mix
_STATIONARY_ITERS = 3


def q_event_type_stationary_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain: where the
    observed transition matrix (event_transition_matrix's lag-window
    counts) sends the traffic mix in the long run — {_STATIONARY_ITERS}
    synchronous power iterations from the uniform start, the PageRank
    float-parity recipe on a |types|²-bounded matrix (per-row double
    products, DECIMAL(28,12) sums per destination, floor projection).
    The chain drops each user's final event (no successor) — mass is
    not exactly conserved, matching both engines identically. Shape:
    one user-partitioned lag window over the raw log, then every
    iteration joins |types|-row tables."""
    ev = _events_ms(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    pairs = ev.withColumn(
        "nxt", F.lead("event_type").over(w)
    ).filter(F.col("nxt").isNotNull())
    counts = pairs.groupBy(
        F.col("event_type").alias("prev"), F.col("nxt").alias("cur")
    ).agg(F.count("*").cast("long").alias("n_ij"))
    totals = counts.groupBy("prev").agg(F.sum("n_ij").cast("long").alias("n_i"))
    p = counts.join(totals, "prev").selectExpr(
        "prev",
        "cur",
        "cast(n_ij as double) / cast(n_i as double) as pij",
    )
    types = ev.select(F.col("event_type").alias("t")).distinct()
    k = types.agg(F.count("*").cast("long").alias("k"))
    v = types.crossJoin(F.broadcast(k)).selectExpr(
        "t", "cast(1 as double) / cast(k as double) as v"
    )
    for _ in range(_STATIONARY_ITERS):
        v = (
            p.join(v.withColumnRenamed("t", "prev"), "prev")
            .groupBy(F.col("cur").alias("t"))
            .agg(
                F.sum(F.expr("cast(v * pij as decimal(28,12))"))
                .cast("double")
                .alias("v")
            )
        )
    return v.selectExpr(
        "t as event_type",
        "cast(floor(v * cast(1000000 as double)) as bigint)"
        " as stationary_ppm",
    )


def _sql_event_type_stationary_mix() -> str:
    it = "\n".join(
        f"""v{i + 1} as (
  select p.cur as t,
         sum(cast(v{i}.v * p.pij as decimal(28,12)))::DOUBLE as v
  from p join v{i} on v{i}.t = p.prev group by p.cur
),"""
        for i in range(_STATIONARY_ITERS)
    )
    return f"""
with ev as ({_EVENTS_MS_CTE}),
pairs as (
  select event_type as prev,
         lead(event_type) over (
           partition by user_id order by ts_ms, event_id
         ) as cur
  from ev
),
counts as (
  select prev, cur, count(*)::BIGINT as n_ij
  from pairs where cur is not null group by prev, cur
),
totals as (select prev, sum(n_ij)::BIGINT as n_i from counts group by prev),
p as (
  select counts.prev, counts.cur,
         cast(n_ij as double) / cast(n_i as double) as pij
  from counts join totals on counts.prev = totals.prev
),
types as (select distinct event_type as t from ev),
k as (select count(*)::BIGINT as k from types),
v0 as (
  select t, cast(1 as double) / cast(k as double) as v
  from types cross join k
),
{it}
sel as (select * from v{_STATIONARY_ITERS})
select t as event_type,
       cast(floor(v * cast(1000000 as double)) as bigint) as stationary_ppm
from sel
"""


def q_event_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate by session entry type: sessionize (30-min lag-gap,
    the batch idiom shared with `sessionization`), credit each session
    to the event type that OPENED it (the flagged first row — no
    argmin struct gymnastics needed: the session-start flag IS the
    entry marker), and report the share of single-event sessions —
    the landing-page health metric. One user-partitioned window pass,
    one bounded groupBy per session, one per-type rollup."""
    ev = _events_ms(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    gap = F.col("ts_ms") - F.lag("ts_ms").over(w)
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 30 * 60 * 1000), 1).otherwise(0),
    ).withColumn("sess_id", F.sum("new_sess").over(run))
    per = flagged.groupBy("user_id", "sess_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max(
            F.when(F.col("new_sess") == 1, F.col("event_type"))
        ).alias("entry_type"),
    )
    return per.groupBy("entry_type").agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.sum(F.expr("case when n_events = 1 then 1 else 0 end"))
        .cast("long")
        .alias("n_bounces"),
    ).selectExpr(
        "entry_type",
        "n_sessions",
        "n_bounces",
        "cast((n_bounces * cast(1000000 as bigint)) div n_sessions"
        " as bigint) as bounce_ppm",
    )


SQL_EVENT_BOUNCE_RATE = f"""
with ev as ({_EVENTS_MS_CTE}),
g as (
  select user_id, event_id, event_type, ts_ms,
         case when lag(ts_ms) over (
                partition by user_id order by ts_ms, event_id
              ) is null
              or ts_ms - lag(ts_ms) over (
                partition by user_id order by ts_ms, event_id
              ) > 1800000
              then 1 else 0 end as new_sess
  from ev
),
s as (
  select user_id, event_type, new_sess,
         sum(new_sess) over (
           partition by user_id order by ts_ms, event_id
           rows between unbounded preceding and current row
         ) as sess_id
  from g
),
per as (
  select user_id, sess_id, count(*)::BIGINT as n_events,
         max(case when new_sess = 1 then event_type end) as entry_type
  from s group by user_id, sess_id
)
select entry_type, count(*)::BIGINT as n_sessions,
       sum(case when n_events = 1 then 1 else 0 end)::BIGINT as n_bounces,
       ((sum(case when n_events = 1 then 1 else 0 end) * 1000000)
        // count(*))::BIGINT as bounce_ppm
from per group by entry_type
"""


# --- session-42: as-of join + interval join --------------------------------

#: fee schedule: 4 epochs per event type over the observation span
_FEE_EPOCHS = 4


def _fee_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, start_ms, fee_bps) — a versioned fee schedule derived
    deterministically from the event span: epoch k starts at
    lo + k*(span div {_FEE_EPOCHS}) and charges (k+1)*25 bps."""
    ev = _events_ms(spark, sf_dir)
    span = ev.agg(F.min("ts_ms").alias("lo"), F.max("ts_ms").alias("hi"))
    types = ev.select(F.col("event_type")).distinct()
    return (
        types.crossJoin(F.broadcast(span))
        .select(
            "event_type",
            "lo",
            "hi",
            F.explode(F.expr(f"sequence(0, {_FEE_EPOCHS - 1})")).alias("k"),
        )
        .selectExpr(
            "event_type",
            f"cast(lo + k * ((hi - lo) div {_FEE_EPOCHS}) as bigint)"
            " as start_ms",
            "cast((k + 1) * 25 as bigint) as fee_bps",
        )
    )


def q_event_asof_fee_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN (operators/asof.asof_join — Spark has no native one;
    this is the union+window composition, ONE shuffle on the key):
    every event picks the fee-schedule version in force at its
    timestamp, then revenue rolls up per (type, fee_bps) with the fee
    in exact integer cents. The ORACLE is DuckDB's NATIVE `ASOF JOIN` —
    two genuinely different formulations of the same operator agreeing
    is the strongest correctness signal in the catalog. The versioned-
    dimension join every billing/config/robots-epoch pipeline needs."""
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events").selectExpr(
        "event_type",
        "event_id",
        "cast(unix_millis(cast(ts as timestamp)) as bigint) as ts_ms",
        "cast(floor(cast(value as decimal(18,4)) * 100) as bigint) as cents",
    )
    fees = _fee_dim(spark, sf_dir)
    j = asof_join(
        ev,
        fees,
        key_cols=["event_type"],
        ts_col="ts_ms",
        value_cols=["fee_bps"],
        right_ts_col="start_ms",
    )
    return j.groupBy("event_type", "fee_bps").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("cents").cast("long").alias("value_cents"),
        F.sum(F.expr("cast(cents * fee_bps div 10000 as bigint)"))
        .cast("long")
        .alias("fee_cents"),
    )


SQL_EVENT_ASOF_FEE_JOIN = f"""
with ev as (
  select event_type, event_id, epoch_ms(ts) as ts_ms,
         cast(floor(value::DECIMAL(18,4) * 100) as bigint) as cents
  from events
),
span as (select min(ts_ms) as lo, max(ts_ms) as hi from ev),
types as (select distinct event_type from ev),
fees as (
  select event_type,
         (lo + k * ((hi - lo) // {_FEE_EPOCHS}))::BIGINT as start_ms,
         ((k + 1) * 25)::BIGINT as fee_bps
  from types cross join span
       cross join (select unnest(range({_FEE_EPOCHS})) as k)
),
j as (
  select e.event_type, e.cents, f.fee_bps
  from ev e asof join fees f
    on e.event_type = f.event_type and e.ts_ms >= f.start_ms
)
select event_type, fee_bps, count(*)::BIGINT as n_events,
       sum(cents)::BIGINT as value_cents,
       sum(cents * fee_bps // 10000)::BIGINT as fee_cents
from j group by event_type, fee_bps
"""


#: maintenance windows: 5 slots, each 1/20 of the span (10% duty overall)
_MAINT_WINDOWS = 5


def q_event_maintenance_window_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join against a small window dimension: which events fell
    inside each of the {_MAINT_WINDOWS} planned maintenance windows
    (start-inclusive, end-exclusive) — impact sizing for incident
    review. The dim is O(windows) rows, so the right plan IS the
    broadcast range join (a nested-loop over a broadcast 5-row table is
    a map-side filter, the documented exception to the no-NL rule —
    contrast event_stickiness, where a broadcast range join over a
    GROWING side would be the trap). Rollup per window, integer
    cents."""
    ev = _t(spark, sf_dir, "events").selectExpr(
        "user_id",
        "cast(unix_millis(cast(ts as timestamp)) as bigint) as ts_ms",
        "cast(floor(cast(value as decimal(18,4)) * 100) as bigint) as cents",
    )
    span = ev.agg(F.min("ts_ms").alias("lo"), F.max("ts_ms").alias("hi"))
    wins = (
        spark.range(_MAINT_WINDOWS)
        .selectExpr("cast(id as bigint) as window_id")
        .crossJoin(F.broadcast(span))
        .selectExpr(
            "window_id",
            f"cast(lo + window_id * ((hi - lo) div {_MAINT_WINDOWS})"
            " as bigint) as start_ms",
            f"cast(lo + window_id * ((hi - lo) div {_MAINT_WINDOWS})"
            f" + ((hi - lo) div 20) as bigint) as end_ms",
        )
    )
    j = ev.join(
        F.broadcast(wins),
        (F.col("ts_ms") >= F.col("start_ms")) & (F.col("ts_ms") < F.col("end_ms")),
    )
    return j.groupBy("window_id", "start_ms", "end_ms").agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum("cents").cast("long").alias("value_cents"),
    )


SQL_EVENT_MAINTENANCE_WINDOW_IMPACT = f"""
with ev as (
  select user_id, epoch_ms(ts) as ts_ms,
         cast(floor(value::DECIMAL(18,4) * 100) as bigint) as cents
  from events
),
span as (select min(ts_ms) as lo, max(ts_ms) as hi from ev),
wins as (
  select k::BIGINT as window_id,
         (lo + k * ((hi - lo) // {_MAINT_WINDOWS}))::BIGINT as start_ms,
         (lo + k * ((hi - lo) // {_MAINT_WINDOWS})
          + ((hi - lo) // 20))::BIGINT as end_ms
  from span cross join (select unnest(range({_MAINT_WINDOWS})) as k)
)
select window_id, start_ms, end_ms,
       count(*)::BIGINT as n_events,
       count(distinct user_id)::BIGINT as n_users,
       sum(cents)::BIGINT as value_cents
from ev join wins
  on ev.ts_ms >= wins.start_ms and ev.ts_ms < wins.end_ms
group by window_id, start_ms, end_ms
"""


# --- session-43: hypertable rollup, KMV theta sketch ------------------------


def q_event_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable continuous aggregate (the TimescaleDB pattern): hourly
    cells from ONE raw scan, daily cells derived FROM THE HOURLY level,
    weekly from daily — coarser resolutions never rescan raw data,
    which is the whole economics of a 100 TB metrics store (the raw
    scan happens once; every level above it aggregates a bounded cell
    table). The three levels union into one frame with a level tag.
    The finer levels are persisted before the union — a union of
    selects over one lineage re-RUNS that lineage per branch (the r3
    union-embeds lesson). All integer: counts + decimal-floored
    cents."""
    from ..caching import track_persist

    ev = _t(spark, sf_dir, "events").selectExpr(
        "event_type",
        "cast(unix_millis(cast(ts as timestamp)) div 3600000 as bigint)"
        " as hour_b",
        "cast(floor(cast(value as decimal(18,4)) * 100) as bigint) as cents",
    )
    hourly = track_persist(
        ev.groupBy("event_type", "hour_b").agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("value_cents"),
        )
    )
    daily = track_persist(
        hourly.selectExpr(
            "event_type", "cast(hour_b div 24 as bigint) as day_b",
            "n_events", "value_cents"
        ).groupBy("event_type", "day_b").agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("value_cents").cast("long").alias("value_cents"),
        )
    )
    weekly = daily.selectExpr(
        "event_type", "cast(day_b div 7 as bigint) as week_b",
        "n_events", "value_cents"
    ).groupBy("event_type", "week_b").agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("value_cents").cast("long").alias("value_cents"),
    )
    h = hourly.selectExpr(
        "'1h' as level",
        "cast(hour_b * 3600000 as bigint) as bucket_start_ms",
        "event_type", "n_events", "value_cents",
    )
    d = daily.selectExpr(
        "'1d' as level",
        "cast(day_b * 86400000 as bigint) as bucket_start_ms",
        "event_type", "n_events", "value_cents",
    )
    w = weekly.selectExpr(
        "'1w' as level",
        "cast(week_b * 604800000 as bigint) as bucket_start_ms",
        "event_type", "n_events", "value_cents",
    )
    return h.unionByName(d).unionByName(w)


SQL_EVENT_HYPERTABLE_ROLLUP = """
with ev as (
  select event_type, epoch_ms(ts) // 3600000 as hour_b,
         cast(floor(value::DECIMAL(18,4) * 100) as bigint) as cents
  from events
),
hourly as (
  select event_type, hour_b, count(*)::BIGINT as n_events,
         sum(cents)::BIGINT as value_cents
  from ev group by event_type, hour_b
),
daily as (
  select event_type, hour_b // 24 as day_b,
         sum(n_events)::BIGINT as n_events,
         sum(value_cents)::BIGINT as value_cents
  from hourly group by event_type, hour_b // 24
),
weekly as (
  select event_type, day_b // 7 as week_b,
         sum(n_events)::BIGINT as n_events,
         sum(value_cents)::BIGINT as value_cents
  from daily group by event_type, day_b // 7
)
select '1h' as level, (hour_b * 3600000)::BIGINT as bucket_start_ms,
       event_type, n_events, value_cents
from hourly
union all
select '1d' as level, (day_b * 86400000)::BIGINT as bucket_start_ms,
       event_type, n_events, value_cents
from daily
union all
select '1w' as level, (week_b * 604800000)::BIGINT as bucket_start_ms,
       event_type, n_events, value_cents
from weekly
"""


#: chi-square threshold for 1 dof at p=0.05, in milli-units
_SRM_CHI2_MILLI_THRESHOLD = 3841


def q_event_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guard for the A/B family: per event type,
    the chi-square statistic of the observed variant split against the
    designed 50/50 ((a-b)²/(a+b) for equal expectations — exact
    rational over BIGINTs, floored to milli-units) and the SRM flag at
    the 1-dof p=0.05 threshold. A flagged experiment's lift numbers
    (event_ab_test / _zscore) are void — assignment is broken, not the
    metric. One bounded groupBy."""
    ev = _t(spark, sf_dir, "events").selectExpr(
        "event_type",
        f"cast({_AB_VARIANT_EXPR} as bigint) % 2 as variant",
    )
    agg = ev.groupBy("event_type").agg(
        F.sum(F.expr("case when variant = 0 then 1 else 0 end"))
        .cast("long")
        .alias("n_a"),
        F.sum(F.expr("case when variant = 1 then 1 else 0 end"))
        .cast("long")
        .alias("n_b"),
    )
    return agg.selectExpr(
        "event_type",
        "n_a",
        "n_b",
        "cast(((n_a - n_b) * (n_a - n_b) * cast(1000 as bigint))"
        " div (n_a + n_b) as bigint) as chi2_milli",
    ).selectExpr(
        "event_type",
        "n_a",
        "n_b",
        "chi2_milli",
        f"cast(case when chi2_milli > {_SRM_CHI2_MILLI_THRESHOLD}"
        " then 1 else 0 end as bigint) as srm_flag",
    )


SQL_EVENT_AB_SRM_CHECK = f"""
with ev as (
  select event_type, cast({_AB_VARIANT_EXPR} as bigint) % 2 as variant
  from events
),
agg as (
  select event_type,
         sum(case when variant = 0 then 1 else 0 end)::BIGINT as n_a,
         sum(case when variant = 1 then 1 else 0 end)::BIGINT as n_b
  from ev group by event_type
)
select event_type, n_a, n_b,
       (((n_a - n_b) * (n_a - n_b) * 1000) // (n_a + n_b))::BIGINT
         as chi2_milli,
       (case when ((n_a - n_b) * (n_a - n_b) * 1000) // (n_a + n_b)
               > {_SRM_CHI2_MILLI_THRESHOLD} then 1 else 0 end)::BIGINT
         as srm_flag
from agg
"""


def q_event_value_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized revenue mean per event type: clamp cents to the exact
    discrete p05/p95 order statistics before averaging — the robust
    headline metric that one whale or one refund can't move (the
    mean/median gap in event_value_percentiles says WHETHER tails
    distort; this ships the distortion-free number). Discrete ranks by
    the latency_quantiles recipe ((n-1)·p div 100 + 1, ties broken by
    event_id), clamp + integer sums — no floats anywhere."""
    ev = _t(spark, sf_dir, "events").selectExpr(
        "event_type",
        "event_id",
        "cast(floor(cast(value as decimal(18,4)) * 100) as bigint) as cents",
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wall = Window.partitionBy("event_type")
    x = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(wall)
    )
    pick = lambda p: F.max(  # noqa: E731
        F.when(F.col("rn") == F.expr(f"(n - 1) * {p} div 100 + 1"), F.col("cents"))
    ).cast("long")
    bounds = x.groupBy("event_type").agg(
        pick(5).alias("lo_cents"), pick(95).alias("hi_cents")
    )
    j = ev.join(bounds, "event_type").selectExpr(
        "event_type",
        "cents",
        "lo_cents",
        "hi_cents",
        "least(greatest(cents, lo_cents), hi_cents) as wcents",
    )
    return j.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max("lo_cents").cast("long").alias("lo_cents"),
        F.max("hi_cents").cast("long").alias("hi_cents"),
        F.expr("cast(sum(cents) div count(*) as bigint)").alias("mean_cents"),
        F.expr("cast(sum(wcents) div count(*) as bigint)").alias(
            "winsorized_mean_cents"
        ),
        F.sum(
            F.expr("case when cents <> wcents then 1 else 0 end")
        ).cast("long").alias("n_clipped"),
    )


SQL_EVENT_VALUE_WINSORIZED_MEAN = """
with ev as (
  select event_type, event_id,
         cast(floor(value::DECIMAL(18,4) * 100) as bigint) as cents
  from events
),
x as (
  select event_type, cents,
         row_number() over (
           partition by event_type order by cents, event_id
         ) as rn,
         count(*) over (partition by event_type) as n
  from ev
),
bounds as (
  select event_type,
         max(case when rn = (n - 1) * 5 // 100 + 1 then cents end)::BIGINT
           as lo_cents,
         max(case when rn = (n - 1) * 95 // 100 + 1 then cents end)::BIGINT
           as hi_cents
  from x group by event_type
),
j as (
  select ev.event_type, cents, lo_cents, hi_cents,
         least(greatest(cents, lo_cents), hi_cents) as wcents
  from ev join bounds on ev.event_type = bounds.event_type
)
select event_type, count(*)::BIGINT as n_events,
       max(lo_cents)::BIGINT as lo_cents,
       max(hi_cents)::BIGINT as hi_cents,
       (sum(cents) // count(*))::BIGINT as mean_cents,
       (sum(wcents) // count(*))::BIGINT as winsorized_mean_cents,
       sum(case when cents <> wcents then 1 else 0 end)::BIGINT as n_clipped
from j group by event_type
"""


def q_event_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral novelty rate per day: the share of events whose
    (user, type) pair appears for the FIRST time that day — product
    surfaces driving new behaviors vs repeat usage (the per-day face
    of event_new_vs_returning, which tracks only first-ever USERS).
    First-seen via one (user, type) groupBy joined back on the pair
    key — no window over the raw log. Days are epoch arithmetic."""
    ev = _t(spark, sf_dir, "events").selectExpr(
        "user_id",
        "event_type",
        "cast(unix_millis(cast(ts as timestamp)) as bigint) as ts_ms",
    )
    first = ev.groupBy("user_id", "event_type").agg(
        F.min("ts_ms").alias("first_ms")
    )
    j = ev.join(first, ["user_id", "event_type"]).selectExpr(
        "cast(ts_ms div 86400000 as bigint) as day",
        "case when ts_ms = first_ms then 1 else 0 end as novel",
    )
    return j.groupBy("day").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("novel").cast("long").alias("n_novel"),
    ).selectExpr(
        "day",
        "n_events",
        "n_novel",
        "cast((n_novel * cast(1000000 as bigint)) div n_events as bigint)"
        " as novelty_ppm",
    )


SQL_EVENT_NOVELTY_RATE = """
with ev as (
  select user_id, event_type, epoch_ms(ts) as ts_ms from events
),
first as (
  select user_id, event_type, min(ts_ms) as first_ms
  from ev group by user_id, event_type
),
j as (
  select (ev.ts_ms // 86400000)::BIGINT as day,
         case when ev.ts_ms = first.first_ms then 1 else 0 end as novel
  from ev join first
    on ev.user_id = first.user_id and ev.event_type = first.event_type
)
select day, count(*)::BIGINT as n_events, sum(novel)::BIGINT as n_novel,
       ((sum(novel) * 1000000) // count(*))::BIGINT as novelty_ppm
from j group by day
"""


# --- session-48: velocity bursts, autoscale plan, extract routing -----------

#: burst = this many events from one user inside the sliding window
_BURST_WINDOW_MS = 600000
_BURST_THRESHOLD = 5


def q_event_velocity_burst_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Velocity-rule fraud check: per user, the max number of events
    inside any trailing 10-minute window (a true RANGE frame over
    event-time — every event counts its companions by TIMESTAMP
    distance, not row distance; the only ROWS-frame approximation
    would undercount ties and gaps) and whether the {_BURST_THRESHOLD}+
    burst rule fires. One user-partitioned range window + one
    groupBy — the batch twin of a streaming CEP rule."""
    ev = _t(spark, sf_dir, "events").selectExpr(
        "user_id",
        "cast(unix_millis(cast(ts as timestamp)) as bigint) as ts_ms",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms")
        .rangeBetween(-_BURST_WINDOW_MS, 0)
    )
    b = ev.withColumn("win_n", F.count("*").over(w))
    return b.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max("win_n").cast("long").alias("max_burst"),
        F.sum(
            F.expr(f"case when win_n >= {_BURST_THRESHOLD} then 1 else 0 end")
        ).cast("long").alias("n_burst_events"),
    ).selectExpr(
        "user_id",
        "n_events",
        "max_burst",
        "n_burst_events",
        f"cast(case when max_burst >= {_BURST_THRESHOLD} then 1 else 0 end"
        " as bigint) as velocity_flag",
    )


SQL_EVENT_VELOCITY_BURST_DETECT = f"""
with ev as (select user_id, epoch_ms(ts) as ts_ms from events),
b as (
  select user_id,
         count(*) over (
           partition by user_id order by ts_ms
           range between {_BURST_WINDOW_MS} preceding and current row
         ) as win_n
  from ev
)
select user_id, count(*)::BIGINT as n_events,
       max(win_n)::BIGINT as max_burst,
       sum(case when win_n >= {_BURST_THRESHOLD} then 1 else 0 end)::BIGINT
         as n_burst_events,
       (case when max(win_n) >= {_BURST_THRESHOLD} then 1 else 0 end)::BIGINT
         as velocity_flag
from b group by user_id
"""


# --- session-50: seasonal anomaly, case-sensitivity probe -------------------


def q_event_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-adjusted daily anomaly detection: each (type, day)'s
    count compares against the median of up to 3 PRIOR SAME-WEEKDAY
    days — event_daily_anomaly's trailing baseline reads every Sunday
    as an anomaly on weekday-seasonal traffic; partitioning the
    baseline window by (type, weekday) removes exactly that false
    positive class. BIGINT counts make the median an exact .5-step
    double (emitted ×10 as BIGINT); spike/dip flags are exact
    comparisons. Window over the bounded (type, day) rollup, never the
    raw log."""
    daily = _t(spark, sf_dir, "events").selectExpr(
        "event_type",
        "cast(unix_millis(cast(ts as timestamp)) div 86400000 as bigint)"
        " as day",
    ).groupBy("event_type", "day").agg(
        F.count("*").cast("long").alias("n")
    ).selectExpr(
        "event_type", "day", "cast((day + 3) % 7 as bigint) as dow", "n"
    )
    w = (
        Window.partitionBy("event_type", "dow")
        .orderBy("day")
        .rowsBetween(-3, -1)
    )
    # Spark refuses aggregate median over a FRAME — collect the ≤3-row
    # frame and take the array median (order-free after array_sort);
    # DuckDB's native frame median is the independent twin
    b = daily.withColumn(
        "__arr", F.array_sort(F.collect_list("n").over(w))
    ).selectExpr(
        "event_type",
        "day",
        "dow",
        "n",
        "case when size(__arr) = 0 then cast(null as double)"
        " when size(__arr) % 2 = 1 then"
        " cast(element_at(__arr, cast((size(__arr) + 1) div 2 as int))"
        " as double)"
        " else (element_at(__arr, cast(size(__arr) div 2 as int))"
        " + element_at(__arr, cast(size(__arr) div 2 + 1 as int)))"
        " / cast(2 as double) end as expected",
    )
    return b.selectExpr(
        "event_type",
        "day",
        "dow",
        "n",
        "cast(expected * 10 as bigint) as expected_decims",
        "cast(case when expected is not null and cast(n as double)"
        " > 2 * expected then 1 else 0 end as bigint) as spike",
        "cast(case when expected is not null and cast(n as double) * 2"
        " < expected then 1 else 0 end as bigint) as dip",
    )


SQL_EVENT_SEASONAL_ANOMALY = """
with daily as (
  select event_type, epoch_ms(ts) // 86400000 as day,
         count(*)::BIGINT as n
  from events group by 1, 2
),
d2 as (
  select event_type, day::BIGINT as day, ((day + 3) % 7)::BIGINT as dow, n
  from daily
),
b as (
  select event_type, day, dow, n,
         median(n) over (
           partition by event_type, dow order by day
           rows between 3 preceding and 1 preceding
         ) as expected
  from d2
)
select event_type, day, dow, n,
       cast(expected * 10 as bigint) as expected_decims,
       (case when expected is not null and cast(n as double) > 2 * expected
             then 1 else 0 end)::BIGINT as spike,
       (case when expected is not null and cast(n as double) * 2 < expected
             then 1 else 0 end)::BIGINT as dip
from b
"""


# --- session-51: paired t-test, hreflang clusters, singleflight -------------


def q_event_paired_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired t-test of per-user spend across the two observation
    halves (same midpoint split as event_type_share_drift): each
    user's cent difference d = second − first is one paired sample;
    t = mean(d)·√n / sd(d) — the within-subject test the unpaired
    Welch z (event_ab_test_zscore) can't replace when the cohort is
    identical across periods. Differences are exact BIGINT cents;
    moments accumulate DECIMAL(38,0); the t formula is per-value
    double + one sqrt, floor-milli. ONE row."""
    ev = _t(spark, sf_dir, "events").selectExpr(
        "user_id",
        "cast(unix_millis(cast(ts as timestamp)) as bigint) as ts_ms",
        "cast(value as decimal(18,4)) as v",
    )
    span = ev.agg(F.min("ts_ms").alias("lo"), F.max("ts_ms").alias("hi"))
    per = ev.crossJoin(F.broadcast(span)).selectExpr(
        "user_id",
        "case when ts_ms * 2 < lo + hi then 0 else 1 end as h",
        "v",
    ).groupBy("user_id").agg(
        F.expr(
            "cast(floor(sum(case when h = 1 then v else cast(0 as"
            " decimal(18,4)) end) * 100) as bigint)"
            " - cast(floor(sum(case when h = 0 then v else cast(0 as"
            " decimal(18,4)) end) * 100) as bigint) as d"
        )
    )
    agg = per.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.expr("cast(d as decimal(38,0))")).alias("sd_"),
        F.sum(F.expr("cast(d * d as decimal(38,0))")).alias("sdd"),
    )
    return agg.selectExpr(
        "n",
        "cast(sd_ as bigint) as sum_diff_cents",
        "cast(floor((cast(sd_ as double) / cast(n as double))"
        " / sqrt((cast(sdd as double) - cast(sd_ as double)"
        " * cast(sd_ as double) / cast(n as double))"
        " / cast(n - 1 as double) / cast(n as double))"
        " * cast(1000 as double)) as bigint) as t_stat_milli",
    )


SQL_EVENT_PAIRED_TTEST = """
with ev as (
  select user_id, epoch_ms(ts) as ts_ms, value::DECIMAL(18,4) as v
  from events
),
span as (select min(ts_ms) as lo, max(ts_ms) as hi from ev),
per as (
  select user_id,
         cast(floor(sum(case when ts_ms * 2 >= lo + hi then v
                        else 0::DECIMAL(18,4) end) * 100) as bigint)
         - cast(floor(sum(case when ts_ms * 2 < lo + hi then v
                          else 0::DECIMAL(18,4) end) * 100) as bigint) as d
  from ev cross join span
  group by user_id
),
agg as (
  select count(*)::BIGINT as n,
         sum(cast(d as decimal(38,0))) as sd_,
         sum(cast(d * d as decimal(38,0))) as sdd
  from per
)
select n, cast(sd_ as bigint) as sum_diff_cents,
       cast(floor((cast(sd_ as double) / cast(n as double))
         / sqrt((cast(sdd as double) - cast(sd_ as double)
           * cast(sd_ as double) / cast(n as double))
           / cast(n - 1 as double) / cast(n as double))
         * cast(1000 as double)) as bigint) as t_stat_milli
from agg
"""


def q_event_depth_vs_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion rate by session depth: sessions (30-min lag-gap)
    banded by their event count on the dyadic ladder, each band's
    purchase-conversion rate — the engagement-depth curve behind
    "do longer sessions convert more", which the funnel's step view
    doesn't answer. One window pass, one per-session groupBy, a
    ≤7-row band rollup."""
    ev = _events_ms(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap = F.col("ts_ms") - F.lag("ts_ms").over(w)
    flagged = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 30 * 60 * 1000), 1).otherwise(0),
    ).withColumn("sess_id", F.sum("new_sess").over(run))
    per = flagged.groupBy("user_id", "sess_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max(
            F.expr("case when event_type = 'purchase' then 1 else 0 end")
        ).cast("long").alias("converted"),
    )
    b = per.selectExpr(
        f"cast({_DEG_BUCKET_CASE.format(d='n_events')} as bigint) as band",
        "converted",
    )
    return b.groupBy("band").agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.sum("converted").cast("long").alias("n_converted"),
    ).selectExpr(
        "band",
        "n_sessions",
        "n_converted",
        "cast((n_converted * cast(1000000 as bigint)) div n_sessions"
        " as bigint) as cvr_ppm",
    )


SQL_EVENT_DEPTH_VS_CONVERSION = f"""
with ev as ({_EVENTS_MS_CTE}),
g as (
  select user_id, event_id, event_type, ts_ms,
         case when lag(ts_ms) over (
                partition by user_id order by ts_ms, event_id
              ) is null
              or ts_ms - lag(ts_ms) over (
                partition by user_id order by ts_ms, event_id
              ) > 1800000
              then 1 else 0 end as new_sess
  from ev
),
s as (
  select user_id, event_type,
         sum(new_sess) over (
           partition by user_id order by ts_ms, event_id
           rows between unbounded preceding and current row
         ) as sess_id
  from g
),
per as (
  select user_id, sess_id, count(*)::BIGINT as n_events,
         max(case when event_type = 'purchase' then 1 else 0 end)::BIGINT
           as converted
  from s group by user_id, sess_id
),
b as (
  select ({_DEG_BUCKET_CASE.format(d='n_events')})::BIGINT as band,
         converted
  from per
)
select band, count(*)::BIGINT as n_sessions,
       sum(converted)::BIGINT as n_converted,
       ((sum(converted) * 1000000) // count(*))::BIGINT as cvr_ppm
from b group by band
"""


def q_event_wau_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week active-user stability: for every adjacent week
    pair, the Jaccard overlap of the two active-user sets — the
    stability number cohort retention (first-seen-anchored) doesn't
    give: a product can hold WAU while churning 40% of its users every
    week. Weekly distinct (week, user) rollup, self-join on week+1 ∧
    user for the intersection, week totals attached by key. All
    bounded by (weeks × users)."""
    wu = _t(spark, sf_dir, "events").selectExpr(
        "cast(unix_millis(cast(ts as timestamp)) div 604800000 as bigint)"
        " as week",
        "user_id",
    ).distinct()
    totals = wu.groupBy("week").agg(
        F.count("*").cast("long").alias("n_users")
    )
    inter = (
        wu.alias("a")
        .join(
            wu.alias("b"),
            F.expr("a.week + 1 = b.week and a.user_id = b.user_id"),
        )
        .groupBy(F.expr("a.week").alias("week"))
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    pairs = (
        totals.alias("ta")
        .join(
            totals.selectExpr("week - 1 as week", "n_users as n_b"), "week"
        )
        .join(inter, "week", "left")
    )
    return pairs.selectExpr(
        "week",
        "week + 1 as next_week",
        "n_users as n_a",
        "n_b",
        "cast(coalesce(n_inter, 0) as bigint) as n_both",
        "cast((coalesce(n_inter, 0) * cast(1000000 as bigint))"
        " div (n_users + n_b - coalesce(n_inter, 0)) as bigint)"
        " as jaccard_ppm",
    )


SQL_EVENT_WAU_OVERLAP_JACCARD = """
with wu as (
  select distinct epoch_ms(ts) // 604800000 as week, user_id from events
),
totals as (select week, count(*)::BIGINT as n_users from wu group by week),
inter as (
  select a.week, count(*)::BIGINT as n_inter
  from wu a join wu b on a.week + 1 = b.week and a.user_id = b.user_id
  group by a.week
),
pairs as (
  select ta.week, ta.n_users, tb.n_users as n_b, inter.n_inter
  from totals ta
  join totals tb on ta.week + 1 = tb.week
  left join inter on ta.week = inter.week
)
select week::BIGINT as week, (week + 1)::BIGINT as next_week,
       n_users as n_a, n_b,
       coalesce(n_inter, 0)::BIGINT as n_both,
       ((coalesce(n_inter, 0) * 1000000)
        // (n_users + n_b - coalesce(n_inter, 0)))::BIGINT as jaccard_ppm
from pairs
"""


#: a cascade minute carries at least this many error events
_CASCADE_MIN_ERRORS = 2


def q_event_error_cascade_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systemic-error episode detection: minutes whose error-event count
    reaches {_CASCADE_MIN_ERRORS} merge into cascade EPISODES when
    consecutive (gaps-and-islands over the bounded minute rollup —
    never a window over the raw log), each episode reporting its span
    and error mass — the incident-segmentation view that a flat error
    rate (crawl_error_rate_by_host) can't give: one 10-minute cascade
    and ten scattered errors read identically there."""
    mins = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "error"
    ).selectExpr(
        "cast(unix_millis(cast(ts as timestamp)) div 60000 as bigint)"
        " as minute"
    ).groupBy("minute").agg(F.count("*").cast("long").alias("n_errors"))
    hot = mins.filter(F.col("n_errors") >= _CASCADE_MIN_ERRORS)
    w = Window.orderBy("minute")
    run = Window.orderBy("minute").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marked = hot.withColumn("prev", F.lag("minute").over(w)).withColumn(
        "new_ep",
        F.expr("case when prev is null or minute - prev > 1 then 1 else 0 end"),
    ).withColumn("episode", F.sum("new_ep").over(run))
    return marked.groupBy("episode").agg(
        F.min("minute").cast("long").alias("start_minute"),
        F.max("minute").cast("long").alias("end_minute"),
        F.count("*").cast("long").alias("n_minutes"),
        F.sum("n_errors").cast("long").alias("n_errors"),
    ).selectExpr(
        "cast(episode as bigint) as episode",
        "start_minute",
        "end_minute",
        "n_minutes",
        "n_errors",
    )


SQL_EVENT_ERROR_CASCADE_WINDOWS = f"""
with mins as (
  select epoch_ms(ts) // 60000 as minute, count(*)::BIGINT as n_errors
  from events where event_type = 'error' group by 1
),
hot as (select * from mins where n_errors >= {_CASCADE_MIN_ERRORS}),
marked as (
  select minute, n_errors, lag(minute) over (order by minute) as prev
  from hot
),
ep as (
  select minute, n_errors,
         sum(case when prev is null or minute - prev > 1 then 1 else 0 end)
           over (order by minute
                 rows between unbounded preceding and current row)
           as episode
  from marked
)
select episode::BIGINT as episode,
       min(minute)::BIGINT as start_minute,
       max(minute)::BIGINT as end_minute,
       count(*)::BIGINT as n_minutes,
       sum(n_errors)::BIGINT as n_errors
from ep group by episode
"""


# --- session-58: deadline conversion ----------------------------------------

#: conversion deadline after the first qualifying touch
_DEADLINE_MS = 3600000


def q_event_deadline_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deadline-bounded conversion: of the users who ever sign up, how
    many purchase within one hour of their FIRST signup vs ever — the
    time-boxed variant the plain funnel (ordered steps, no clock)
    can't express; the deadline is what separates an activation flow
    that works from one users come back to days later. First-signup
    per user is one groupBy; purchases join on the user key with pure
    timestamp predicates. ONE summary row, integer ppm."""
    ev = _events_ms(spark, sf_dir)
    first_signup = ev.filter(F.col("event_type") == "signup").groupBy(
        "user_id"
    ).agg(F.min("ts_ms").alias("s_ms"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_ms"
    )
    j = first_signup.join(purchases, "user_id", "left").groupBy(
        "user_id"
    ).agg(
        F.max(
            F.expr(
                f"case when ts_ms >= s_ms and ts_ms < s_ms + {_DEADLINE_MS}"
                " then 1 else 0 end"
            )
        ).alias("in_1h"),
        F.max(
            F.expr("case when ts_ms >= s_ms then 1 else 0 end")
        ).alias("ever"),
    )
    return j.agg(
        F.count("*").cast("long").alias("n_signed_users"),
        F.sum("in_1h").cast("long").alias("n_converted_1h"),
        F.sum("ever").cast("long").alias("n_converted_ever"),
    ).selectExpr(
        "n_signed_users",
        "n_converted_1h",
        "n_converted_ever",
        "cast((n_converted_1h * cast(1000000 as bigint))"
        " div n_signed_users as bigint) as cvr_1h_ppm",
        "cast((n_converted_ever * cast(1000000 as bigint))"
        " div n_signed_users as bigint) as cvr_ever_ppm",
    )


SQL_EVENT_DEADLINE_CONVERSION = f"""
with ev as ({_EVENTS_MS_CTE}),
first_signup as (
  select user_id, min(ts_ms) as s_ms
  from ev where event_type = 'signup' group by user_id
),
purchases as (
  select user_id, ts_ms from ev where event_type = 'purchase'
),
j as (
  select f.user_id,
         max(case when p.ts_ms >= f.s_ms
                   and p.ts_ms < f.s_ms + {_DEADLINE_MS}
                  then 1 else 0 end) as in_1h,
         max(case when p.ts_ms >= f.s_ms then 1 else 0 end) as ever
  from first_signup f left join purchases p on f.user_id = p.user_id
  group by f.user_id
)
select count(*)::BIGINT as n_signed_users,
       sum(in_1h)::BIGINT as n_converted_1h,
       sum(ever)::BIGINT as n_converted_ever,
       ((sum(in_1h) * 1000000) // count(*))::BIGINT as cvr_1h_ppm,
       ((sum(ever) * 1000000) // count(*))::BIGINT as cvr_ever_ppm
from j
"""


# --- session-60: deadline sweep, delay sweep --------------------------------

#: conversion-deadline grid (minutes)
_DEADLINE_GRID_MIN = (10, 60, 360)


def q_event_deadline_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-deadline sweep: the event_deadline_conversion readout
    at 10 min / 1 h / 6 h in ONE pass — the activation-window tuning
    curve (where does the conversion curve saturate?). The per-user
    first-signup/purchase join runs once; the 3-point grid explodes
    over the joined rows BEFORE the flag aggregate, so the curve costs
    one extra bounded rollup, not three pipelines."""
    ev = _events_ms(spark, sf_dir)
    first_signup = ev.filter(F.col("event_type") == "signup").groupBy(
        "user_id"
    ).agg(F.min("ts_ms").alias("s_ms"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_ms"
    )
    grid = ", ".join(str(m) for m in _DEADLINE_GRID_MIN)
    j = first_signup.join(purchases, "user_id", "left").select(
        "user_id",
        "s_ms",
        "ts_ms",
        F.explode(F.expr(f"array({grid})")).alias("deadline_min"),
    )
    per = j.groupBy("user_id", "deadline_min").agg(
        F.max(
            F.expr(
                "case when ts_ms >= s_ms"
                " and ts_ms < s_ms + cast(deadline_min as bigint) * 60000"
                " then 1 else 0 end"
            )
        ).alias("converted")
    )
    return per.groupBy("deadline_min").agg(
        F.count("*").cast("long").alias("n_signed_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    ).selectExpr(
        "cast(deadline_min as bigint) as deadline_min",
        "n_signed_users",
        "n_converted",
        "cast((n_converted * cast(1000000 as bigint)) div n_signed_users"
        " as bigint) as cvr_ppm",
    )


SQL_EVENT_DEADLINE_SWEEP = f"""
with ev as ({_EVENTS_MS_CTE}),
first_signup as (
  select user_id, min(ts_ms) as s_ms
  from ev where event_type = 'signup' group by user_id
),
purchases as (
  select user_id, ts_ms from ev where event_type = 'purchase'
),
j as (
  select f.user_id, f.s_ms, p.ts_ms,
         unnest([{", ".join(str(m) for m in _DEADLINE_GRID_MIN)}]) as
           deadline_min
  from first_signup f left join purchases p on f.user_id = p.user_id
),
per as (
  select user_id, deadline_min,
         max(case when ts_ms >= s_ms
                   and ts_ms < s_ms + cast(deadline_min as bigint) * 60000
                  then 1 else 0 end) as converted
  from j group by user_id, deadline_min
)
select deadline_min::BIGINT as deadline_min,
       count(*)::BIGINT as n_signed_users,
       sum(converted)::BIGINT as n_converted,
       ((sum(converted) * 1000000) // count(*))::BIGINT as cvr_ppm
from per group by deadline_min
"""


def q_event_weekend_value_premium(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend VALUE premium per event type: mean cents on weekend vs
    weekday and the integer lift — event_weekday_profile counts
    traffic; this prices it (a type whose weekend traffic halves but
    whose basket doubles is a different product than the counts
    suggest). Decimal-exact cent sums, day-of-week by epoch
    arithmetic, max-CASE pivot over the 2-cell axis."""
    ev = _t(spark, sf_dir, "events").selectExpr(
        "event_type",
        "case when (unix_millis(cast(ts as timestamp)) div 86400000 + 3)"
        " % 7 >= 5 then 1 else 0 end as wk",
        "cast(value as decimal(18,4)) as v",
    )
    cells = ev.groupBy("event_type", "wk").agg(
        F.count("*").cast("long").alias("n"),
        F.expr("cast(floor(sum(v) * 100) as bigint)").alias("cents"),
    )
    piv = cells.groupBy("event_type").agg(
        F.max(F.when(F.col("wk") == 0, F.col("n"))).alias("n_wd"),
        F.max(F.when(F.col("wk") == 1, F.col("n"))).alias("n_we"),
        F.max(F.when(F.col("wk") == 0, F.col("cents"))).alias("c_wd"),
        F.max(F.when(F.col("wk") == 1, F.col("cents"))).alias("c_we"),
    )
    return piv.selectExpr(
        "event_type",
        "cast(n_wd as bigint) as n_weekday",
        "cast(n_we as bigint) as n_weekend",
        "cast(c_wd div n_wd as bigint) as mean_weekday_cents",
        "cast(c_we div n_we as bigint) as mean_weekend_cents",
        "cast(((c_we div n_we) * cast(1000000 as bigint))"
        " div nullif(c_wd div n_wd, 0) as bigint) as premium_ppm",
    )


SQL_EVENT_WEEKEND_VALUE_PREMIUM = """
with ev as (
  select event_type,
         case when (epoch_ms(ts) // 86400000 + 3) % 7 >= 5
              then 1 else 0 end as wk,
         value::DECIMAL(18,4) as v
  from events
),
cells as (
  select event_type, wk, count(*)::BIGINT as n,
         cast(floor(sum(v) * 100) as bigint) as cents
  from ev group by event_type, wk
),
piv as (
  select event_type,
         max(case when wk = 0 then n end) as n_wd,
         max(case when wk = 1 then n end) as n_we,
         max(case when wk = 0 then cents end) as c_wd,
         max(case when wk = 1 then cents end) as c_we
  from cells group by event_type
)
select event_type,
       n_wd::BIGINT as n_weekday, n_we::BIGINT as n_weekend,
       (c_wd // n_wd)::BIGINT as mean_weekday_cents,
       (c_we // n_we)::BIGINT as mean_weekend_cents,
       (((c_we // n_we) * 1000000) // nullif(c_wd // n_wd, 0))::BIGINT
         as premium_ppm
from piv
"""


# --- session-62: CUPED adjustment -------------------------------------------


def q_event_ab_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the A/B family: each user's
    POST-period spend is adjusted by θ × (pre-period spend − pre
    mean), θ = cov(pre, post)/var(pre) — the standard trick that
    shrinks experiment confidence intervals by exactly ρ² without
    touching the treatment effect (user-level md5 assignment, so pre
    behavior is independent of variant). ONE row: θ, the variance
    reduction, and raw vs adjusted per-variant means. Every moment is
    an exact DECIMAL(38,0) integer sum (cents); θ/means are per-value
    double arithmetic over those exact sums, floor-projected — the
    assortativity float recipe end to end. Two bounded groupBys."""
    ev = _t(spark, sf_dir, "events").selectExpr(
        "user_id",
        "cast(unix_millis(cast(ts as timestamp)) as bigint) as ts_ms",
        "cast(value as decimal(18,4)) as v",
    )
    span = ev.agg(F.min("ts_ms").alias("lo"), F.max("ts_ms").alias("hi"))
    per = ev.crossJoin(F.broadcast(span)).selectExpr(
        "user_id",
        "case when ts_ms * 2 < lo + hi then 0 else 1 end as h",
        "v",
    ).groupBy("user_id").agg(
        F.expr(
            "cast(floor(sum(case when h = 0 then v else cast(0 as"
            " decimal(18,4)) end) * 100) as bigint)"
        ).alias("x"),
        F.expr(
            "cast(floor(sum(case when h = 1 then v else cast(0 as"
            " decimal(18,4)) end) * 100) as bigint)"
        ).alias("y"),
    ).selectExpr(
        "cast(cast(conv(substr(md5(cast(user_id as varchar(30))), 1, 8),"
        " 16, 10) as bigint) % 2 as bigint) as variant",
        "x",
        "y",
    )
    dec = "cast({e} as decimal(38,0))"
    cells = per.groupBy("variant").agg(
        F.count("*").cast("long").alias("nv"),
        F.sum(F.expr(dec.format(e="x"))).alias("sxv"),
        F.sum(F.expr(dec.format(e="y"))).alias("syv"),
    )
    g = per.agg(
        F.count("*").alias("n"),
        F.sum(F.expr(dec.format(e="x"))).alias("sx"),
        F.sum(F.expr(dec.format(e="y"))).alias("sy"),
        F.sum(F.expr(dec.format(e="x * y"))).alias("sxy"),
        F.sum(F.expr(dec.format(e="x * x"))).alias("sxx"),
        F.sum(F.expr(dec.format(e="y * y"))).alias("syy"),
    )
    piv = cells.groupBy().agg(
        F.max(F.when(F.col("variant") == 0, F.col("nv"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 1, F.col("nv"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 0, F.col("sxv"))).alias("sx_a"),
        F.max(F.when(F.col("variant") == 1, F.col("sxv"))).alias("sx_b"),
        F.max(F.when(F.col("variant") == 0, F.col("syv"))).alias("sy_a"),
        F.max(F.when(F.col("variant") == 1, F.col("syv"))).alias("sy_b"),
    )
    theta = (
        "((cast(n as double) * cast(sxy as double)"
        " - cast(sx as double) * cast(sy as double))"
        " / (cast(n as double) * cast(sxx as double)"
        " - cast(sx as double) * cast(sx as double)))"
    )
    adj = (
        "(cast(sy_{v} as double) / cast(n_{v} as double) - " + theta +
        " * (cast(sx_{v} as double) / cast(n_{v} as double)"
        " - cast(sx as double) / cast(n as double)))"
    )
    rho2 = (
        "((cast(n as double) * cast(sxy as double)"
        " - cast(sx as double) * cast(sy as double))"
        " * (cast(n as double) * cast(sxy as double)"
        " - cast(sx as double) * cast(sy as double))"
        " / ((cast(n as double) * cast(sxx as double)"
        " - cast(sx as double) * cast(sx as double))"
        " * (cast(n as double) * cast(syy as double)"
        " - cast(sy as double) * cast(sy as double))))"
    )
    return piv.crossJoin(F.broadcast(g)).selectExpr(
        "cast(n as bigint) as n_users",
        "cast(n_a as bigint) as n_a",
        "cast(n_b as bigint) as n_b",
        f"cast(floor({theta} * cast(1000000 as double)) as bigint)"
        " as theta_micro",
        f"cast(floor({rho2} * cast(1000000 as double)) as bigint)"
        " as var_reduction_ppm",
        "cast(cast(sy_a as bigint) div n_a as bigint) as raw_mean_a_cents",
        "cast(cast(sy_b as bigint) div n_b as bigint) as raw_mean_b_cents",
        f"cast(floor({adj.format(v='a')}) as bigint) as adj_mean_a_cents",
        f"cast(floor({adj.format(v='b')}) as bigint) as adj_mean_b_cents",
    )


SQL_EVENT_AB_CUPED_ADJUST = """
with ev as (
  select user_id, epoch_ms(ts) as ts_ms, value::DECIMAL(18,4) as v
  from events
),
span as (select min(ts_ms) as lo, max(ts_ms) as hi from ev),
per0 as (
  select user_id,
         cast(floor(sum(case when ts_ms * 2 < lo + hi then v
                        else 0::DECIMAL(18,4) end) * 100) as bigint) as x,
         cast(floor(sum(case when ts_ms * 2 >= lo + hi then v
                        else 0::DECIMAL(18,4) end) * 100) as bigint) as y
  from ev cross join span
  group by user_id
),
per as (
  select ((('0x' || substr(md5(cast(user_id as varchar(30))), 1, 8))
           ::BIGINT) % 2)::BIGINT as variant, x, y
  from per0
),
cells as (
  select variant, count(*)::BIGINT as nv,
         sum(cast(x as decimal(38,0))) as sxv,
         sum(cast(y as decimal(38,0))) as syv
  from per group by variant
),
g as (
  select count(*) as n,
         sum(cast(x as decimal(38,0))) as sx,
         sum(cast(y as decimal(38,0))) as sy,
         sum(cast(x * y as decimal(38,0))) as sxy,
         sum(cast(x * x as decimal(38,0))) as sxx,
         sum(cast(y * y as decimal(38,0))) as syy
  from per
),
piv as (
  select max(case when variant = 0 then nv end) as n_a,
         max(case when variant = 1 then nv end) as n_b,
         max(case when variant = 0 then sxv end) as sx_a,
         max(case when variant = 1 then sxv end) as sx_b,
         max(case when variant = 0 then syv end) as sy_a,
         max(case when variant = 1 then syv end) as sy_b
  from cells
)
select cast(n as bigint) as n_users,
       n_a::BIGINT as n_a, n_b::BIGINT as n_b,
       cast(floor(((cast(n as double) * cast(sxy as double)
         - cast(sx as double) * cast(sy as double))
         / (cast(n as double) * cast(sxx as double)
         - cast(sx as double) * cast(sx as double)))
         * cast(1000000 as double)) as bigint) as theta_micro,
       cast(floor(((cast(n as double) * cast(sxy as double)
         - cast(sx as double) * cast(sy as double))
         * (cast(n as double) * cast(sxy as double)
         - cast(sx as double) * cast(sy as double))
         / ((cast(n as double) * cast(sxx as double)
         - cast(sx as double) * cast(sx as double))
         * (cast(n as double) * cast(syy as double)
         - cast(sy as double) * cast(sy as double))))
         * cast(1000000 as double)) as bigint) as var_reduction_ppm,
       (sy_a::BIGINT // n_a)::BIGINT as raw_mean_a_cents,
       (sy_b::BIGINT // n_b)::BIGINT as raw_mean_b_cents,
       cast(floor(cast(sy_a as double) / cast(n_a as double)
         - ((cast(n as double) * cast(sxy as double)
         - cast(sx as double) * cast(sy as double))
         / (cast(n as double) * cast(sxx as double)
         - cast(sx as double) * cast(sx as double)))
         * (cast(sx_a as double) / cast(n_a as double)
         - cast(sx as double) / cast(n as double))) as bigint)
         as adj_mean_a_cents,
       cast(floor(cast(sy_b as double) / cast(n_b as double)
         - ((cast(n as double) * cast(sxy as double)
         - cast(sx as double) * cast(sy as double))
         / (cast(n as double) * cast(sxx as double)
         - cast(sx as double) * cast(sx as double)))
         * (cast(sx_b as double) / cast(n_b as double)
         - cast(sx as double) / cast(n as double))) as bigint)
         as adj_mean_b_cents
from piv cross join g
"""


def q_event_local_peak_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local traffic peaks on the hourly load curve: hours strictly
    above BOTH neighbors (lag/lead over the bounded hourly rollup)
    with their prominence over the higher neighbor — the
    peak-inventory a capacity planner reads next to the autoscale
    schedule (crawl_autoscale_plan reacts hour-by-hour; peaks say
    where the reactions cluster). Missing neighbors (series edges,
    empty hours) disqualify — a peak needs both sides observed."""
    hourly = _t(spark, sf_dir, "events").selectExpr(
        "cast(unix_millis(cast(ts as timestamp)) div 3600000 as bigint)"
        " as hour_b"
    ).groupBy("hour_b").agg(F.count("*").cast("long").alias("n_events"))
    w = Window.orderBy("hour_b")
    x = hourly.withColumn("prev_h", F.lag("hour_b").over(w)).withColumn(
        "prev_n", F.lag("n_events").over(w)
    ).withColumn("next_h", F.lead("hour_b").over(w)).withColumn(
        "next_n", F.lead("n_events").over(w)
    )
    return x.filter(
        F.expr(
            "prev_h = hour_b - 1 and next_h = hour_b + 1"
            " and n_events > prev_n and n_events > next_n"
        )
    ).selectExpr(
        "hour_b",
        "n_events",
        "cast(n_events - greatest(prev_n, next_n) as bigint)"
        " as prominence",
    )


SQL_EVENT_LOCAL_PEAK_DETECT = """
with hourly as (
  select epoch_ms(ts) // 3600000 as hour_b, count(*)::BIGINT as n_events
  from events group by 1
),
x as (
  select hour_b, n_events,
         lag(hour_b) over (order by hour_b) as prev_h,
         lag(n_events) over (order by hour_b) as prev_n,
         lead(hour_b) over (order by hour_b) as next_h,
         lead(n_events) over (order by hour_b) as next_n
  from hourly
)
select hour_b::BIGINT as hour_b, n_events,
       (n_events - greatest(prev_n, next_n))::BIGINT as prominence
from x
where prev_h = hour_b - 1 and next_h = hour_b + 1
  and n_events > prev_n and n_events > next_n
"""


def q_event_ltv_age_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate LTV curve by user age: revenue earned on each day
    since a user's first appearance, cumulatively — the
    all-cohorts-collapsed curve (event_cohort_value keeps the cohort ×
    offset matrix; finance wants the single curve its area integrates
    to). First-seen via one groupBy; the running sum is a window over
    the BOUNDED age axis, never the raw log. Decimal-exact cents."""
    ev = _t(spark, sf_dir, "events").selectExpr(
        "user_id",
        "cast(unix_millis(cast(ts as timestamp)) div 86400000 as bigint)"
        " as day",
        "cast(value as decimal(18,4)) as v",
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("d0"))
    aged = ev.join(first, "user_id").selectExpr(
        "day - d0 as age_days", "v"
    )
    daily = aged.groupBy("age_days").agg(
        F.expr("cast(floor(sum(v) * 100) as bigint)").alias("day_cents"),
        F.count("*").cast("long").alias("n_events"),
    )
    w = (
        Window.orderBy("age_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.withColumn(
        "cum_cents", F.sum("day_cents").over(w).cast("long")
    ).selectExpr(
        "age_days", "n_events", "day_cents", "cum_cents"
    )


SQL_EVENT_LTV_AGE_CURVE = """
with ev as (
  select user_id, epoch_ms(ts) // 86400000 as day,
         value::DECIMAL(18,4) as v
  from events
),
first as (select user_id, min(day) as d0 from ev group by user_id),
aged as (
  select (ev.day - first.d0)::BIGINT as age_days, v
  from ev join first on ev.user_id = first.user_id
),
daily as (
  select age_days, cast(floor(sum(v) * 100) as bigint) as day_cents,
         count(*)::BIGINT as n_events
  from aged group by age_days
)
select age_days, n_events, day_cents,
       sum(day_cents) over (
         order by age_days
         rows between unbounded preceding and current row
       )::BIGINT as cum_cents
from daily
"""


def q_event_session_type_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session type co-occurrence lift: for each ordered type
    pair (a < b), in how many sessions do BOTH occur vs the
    independence expectation n_a·n_b/n — event_type_affinity measures
    this per USER lifetime, which smears over months; the session
    window is where 'users who view X also buy Y' actually operates.
    Sessionize once (30-min lag-gap), distinct (session, type), then a
    self-join bounded by |types|² through the session key and one
    bounded rollup. Integer lift in ppm."""
    ev = _events_ms(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap = F.col("ts_ms") - F.lag("ts_ms").over(w)
    st = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 30 * 60 * 1000), 1).otherwise(0),
    ).withColumn("sess_id", F.sum("new_sess").over(run)).selectExpr(
        "user_id", "sess_id", "event_type"
    ).distinct()
    from ..caching import track_persist

    st = track_persist(st)
    ns = st.selectExpr("user_id", "sess_id").distinct().agg(
        F.count("*").cast("long").alias("ns")
    )
    per_type = st.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_t")
    )
    pairs = (
        st.selectExpr("user_id", "sess_id", "event_type as type_a")
        .join(
            st.selectExpr("user_id", "sess_id", "event_type as type_b"),
            ["user_id", "sess_id"],
        )
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    j = (
        pairs.join(
            per_type.selectExpr("event_type as type_a", "n_t as n_a"),
            "type_a",
        )
        .join(
            per_type.selectExpr("event_type as type_b", "n_t as n_b"),
            "type_b",
        )
    )
    return j.crossJoin(F.broadcast(ns)).selectExpr(
        "type_a",
        "type_b",
        "n_both",
        "n_a",
        "n_b",
        "cast((n_both * ns * cast(1000000 as bigint))"
        " div (n_a * n_b) as bigint) as lift_ppm",
    )


SQL_EVENT_SESSION_TYPE_PAIRS = f"""
with ev as ({_EVENTS_MS_CTE}),
g as (
  select user_id, event_id, event_type, ts_ms,
         case when lag(ts_ms) over (
                partition by user_id order by ts_ms, event_id
              ) is null
              or ts_ms - lag(ts_ms) over (
                partition by user_id order by ts_ms, event_id
              ) > 1800000
              then 1 else 0 end as new_sess
  from ev
),
s as (
  select distinct user_id, event_type,
         sum(new_sess) over (
           partition by user_id order by ts_ms, event_id
           rows between unbounded preceding and current row
         ) as sess_id
  from g
),
n_sess as (
  select count(*)::BIGINT as ns
  from (select distinct user_id, sess_id from s)
),
per_type as (
  select event_type, count(*)::BIGINT as n_t from s group by event_type
),
pairs as (
  select a.event_type as type_a, b.event_type as type_b,
         count(*)::BIGINT as n_both
  from s a join s b
    on a.user_id = b.user_id and a.sess_id = b.sess_id
   and a.event_type < b.event_type
  group by a.event_type, b.event_type
)
select type_a, type_b, n_both,
       ta.n_t as n_a, tb.n_t as n_b,
       ((n_both * ns * 1000000) // (ta.n_t * tb.n_t))::BIGINT as lift_ppm
from pairs
join per_type ta on pairs.type_a = ta.event_type
join per_type tb on pairs.type_b = tb.event_type
cross join n_sess
"""


def q_event_power_user_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-user band migration between the two observation halves:
    each user's dyadic activity band (the heavy-user ladder) in epoch
    0 vs epoch 1, rolled up to a band→band transition matrix —
    event_heavy_user_share shows the curve at one instant; THIS shows
    whether the top band is the same people or a rotating cast (the
    difference between a loyal core and churn-and-replace). Users
    absent from a half land in band -1. Bounded ladder² matrix."""
    ev = _events_ms(spark, sf_dir)
    span = ev.agg(F.min("ts_ms").alias("lo"), F.max("ts_ms").alias("hi"))
    per = ev.crossJoin(F.broadcast(span)).selectExpr(
        "user_id",
        "case when ts_ms * 2 < lo + hi then 0 else 1 end as h",
    ).groupBy("user_id", "h").agg(F.count("*").cast("long").alias("n"))
    banded = per.selectExpr(
        "user_id",
        "h",
        f"cast({_DEG_BUCKET_CASE.format(d='n')} as bigint) as band",
    )
    a = banded.filter(F.col("h") == 0).select(
        "user_id", F.col("band").alias("band_a")
    )
    b = banded.filter(F.col("h") == 1).select(
        "user_id", F.col("band").alias("band_b")
    )
    m = a.join(b, "user_id", "full_outer").selectExpr(
        "coalesce(band_a, -1) as band_a",
        "coalesce(band_b, -1) as band_b",
    )
    return m.groupBy("band_a", "band_b").agg(
        F.count("*").cast("long").alias("n_users")
    )


def _sql_event_power_user_migration() -> str:
    return f"""
with ev as ({_EVENTS_MS_CTE}),
span as (select min(ts_ms) as lo, max(ts_ms) as hi from ev),
per as (
  select user_id,
         case when ts_ms * 2 < lo + hi then 0 else 1 end as h,
         count(*)::BIGINT as n
  from ev cross join span
  group by user_id, case when ts_ms * 2 < lo + hi then 0 else 1 end
),
banded as (
  select user_id, h, ({_DEG_BUCKET_CASE.format(d='n')})::BIGINT as band
  from per
),
a as (select user_id, band as band_a from banded where h = 0),
b as (select user_id, band as band_b from banded where h = 1),
m as (
  select coalesce(band_a, -1) as band_a, coalesce(band_b, -1) as band_b
  from a full outer join b on a.user_id = b.user_id
)
select band_a::BIGINT as band_a, band_b::BIGINT as band_b,
       count(*)::BIGINT as n_users
from m group by band_a, band_b
"""


# --- session-67: daily SRM trend, dedup granularity card --------------------


def q_event_srm_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio mismatch BY DAY: the event_ab_srm_check χ² per
    calendar day — a broken assignment rarely breaks globally; it
    breaks after a deploy, and the global test dilutes a three-day
    breakage into noise. Same exact-integer χ² against the 50/50
    design, same 1-dof threshold, one bounded (day) rollup."""
    ev = _t(spark, sf_dir, "events").selectExpr(
        "cast(unix_millis(cast(ts as timestamp)) div 86400000 as bigint)"
        " as day",
        f"cast({_AB_VARIANT_EXPR} as bigint) % 2 as variant",
    )
    agg = ev.groupBy("day").agg(
        F.sum(F.expr("case when variant = 0 then 1 else 0 end"))
        .cast("long").alias("n_a"),
        F.sum(F.expr("case when variant = 1 then 1 else 0 end"))
        .cast("long").alias("n_b"),
    )
    return agg.selectExpr(
        "day",
        "n_a",
        "n_b",
        "cast(((n_a - n_b) * (n_a - n_b) * cast(1000 as bigint))"
        " div (n_a + n_b) as bigint) as chi2_milli",
    ).selectExpr(
        "day",
        "n_a",
        "n_b",
        "chi2_milli",
        f"cast(case when chi2_milli > {_SRM_CHI2_MILLI_THRESHOLD}"
        " then 1 else 0 end as bigint) as srm_flag",
    )


SQL_EVENT_SRM_DAILY_TREND = f"""
with ev as (
  select epoch_ms(ts) // 86400000 as day,
         cast({_AB_VARIANT_EXPR} as bigint) % 2 as variant
  from events
),
agg as (
  select day,
         sum(case when variant = 0 then 1 else 0 end)::BIGINT as n_a,
         sum(case when variant = 1 then 1 else 0 end)::BIGINT as n_b
  from ev group by day
)
select day::BIGINT as day, n_a, n_b,
       (((n_a - n_b) * (n_a - n_b) * 1000) // (n_a + n_b))::BIGINT
         as chi2_milli,
       (case when ((n_a - n_b) * (n_a - n_b) * 1000) // (n_a + n_b)
               > {_SRM_CHI2_MILLI_THRESHOLD} then 1 else 0 end)::BIGINT
         as srm_flag
from agg
"""


# --- session-68: A/B duration estimate, host discovery curve ----------------


def q_event_ab_duration_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment sample-size planning per event type: users per arm to
    detect a 5% lift of the mean at ~80% power / α=0.05 via the
    16·σ²/δ² rule of thumb, plus the days that takes at the observed
    arrival rate — the 'how long must this test run' answer computed
    BEFORE anyone launches (the ab_test/zscore entries judge after the
    fact). σ² from exact DECIMAL cent moments; δ = mean/20; ceil by
    integer arithmetic on floored doubles. One bounded groupBy."""
    ev = _t(spark, sf_dir, "events").selectExpr(
        "event_type",
        "cast(unix_millis(cast(ts as timestamp)) div 86400000 as bigint)"
        " as day",
        "cast(floor(cast(value as decimal(18,4)) * 100) as bigint) as c",
    )
    agg = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.countDistinct("day").cast("long").alias("n_days"),
        F.sum(F.expr("cast(c as decimal(38,0))")).alias("s1"),
        F.sum(F.expr("cast(c * c as decimal(38,0))")).alias("s2"),
    )
    var = (
        "((cast(s2 as double) - cast(s1 as double) * cast(s1 as double)"
        " / cast(n as double)) / cast(n - 1 as double))"
    )
    delta = "(cast(s1 as double) / cast(n as double) / cast(20 as double))"
    need = (
        f"cast(floor(16.0e0 * {var} / ({delta} * {delta})) as bigint) + 1"
    )
    return agg.selectExpr(
        "event_type",
        "n",
        "n_days",
        f"{need} as n_per_arm",
        f"cast((({need}) * 2 * n_days + n - 1) div n as bigint)"
        " as est_days_to_run",
    )


SQL_EVENT_AB_DURATION_ESTIMATE = """
with ev as (
  select event_type, epoch_ms(ts) // 86400000 as day,
         cast(floor(value::DECIMAL(18,4) * 100) as bigint) as c
  from events
),
agg as (
  select event_type, count(*)::BIGINT as n,
         count(distinct day)::BIGINT as n_days,
         sum(cast(c as decimal(38,0))) as s1,
         sum(cast(c * c as decimal(38,0))) as s2
  from ev group by event_type
)
select event_type, n, n_days,
       cast(floor(16.0e0
         * ((cast(s2 as double) - cast(s1 as double) * cast(s1 as double)
             / cast(n as double)) / cast(n - 1 as double))
         / ((cast(s1 as double) / cast(n as double) / cast(20 as double))
            * (cast(s1 as double) / cast(n as double)
               / cast(20 as double)))) as bigint) + 1 as n_per_arm,
       cast(((cast(floor(16.0e0
         * ((cast(s2 as double) - cast(s1 as double) * cast(s1 as double)
             / cast(n as double)) / cast(n - 1 as double))
         / ((cast(s1 as double) / cast(n as double) / cast(20 as double))
            * (cast(s1 as double) / cast(n as double)
               / cast(20 as double)))) as bigint) + 1)
         * 2 * n_days + n - 1) // n as bigint) as est_days_to_run
from agg
"""


def q_event_early_value_ltv_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does week-one spend predict lifetime value? ONE row: Pearson of
    (first-7-days cents, total cents) per user — the growth-team
    question behind every early-signal model, and if the answer is
    high, event_ab_duration_estimate's tests can use week-1 spend as
    the CUPED covariate for NEW users too. Shared _CORR_PROJ over
    exact DECIMAL cent moments; week-one is epoch arithmetic off each
    user's first event."""
    ev = _t(spark, sf_dir, "events").selectExpr(
        "user_id",
        "cast(unix_millis(cast(ts as timestamp)) as bigint) as ts_ms",
        "cast(value as decimal(18,4)) as v",
    )
    first = ev.groupBy("user_id").agg(F.min("ts_ms").alias("t0"))
    per = ev.join(first, "user_id").groupBy("user_id").agg(
        F.expr(
            "cast(floor(sum(case when ts_ms < t0 + 604800000 then v"
            " else cast(0 as decimal(18,4)) end) * 100) as bigint)"
        ).alias("x"),
        F.expr("cast(floor(sum(v) * 100) as bigint)").alias("y"),
    )
    dec = "cast({e} as decimal(38,0))"
    agg = per.agg(
        F.count("*").alias("m"),
        F.sum(F.expr(dec.format(e="x"))).alias("sx"),
        F.sum(F.expr(dec.format(e="y"))).alias("sy"),
        F.sum(F.expr(dec.format(e="x * y"))).alias("sxy"),
        F.sum(F.expr(dec.format(e="x * x"))).alias("sxx"),
        F.sum(F.expr(dec.format(e="y * y"))).alias("syy"),
    )
    return agg.selectExpr("cast(m as bigint) as n_users", *_CORR_PROJ)


SQL_EVENT_EARLY_VALUE_LTV_CORR = f"""
with ev as (
  select user_id, epoch_ms(ts) as ts_ms, value::DECIMAL(18,4) as v
  from events
),
first as (select user_id, min(ts_ms) as t0 from ev group by user_id),
per as (
  select ev.user_id,
         cast(floor(sum(case when ts_ms < t0 + 604800000 then v
                        else 0::DECIMAL(18,4) end) * 100) as bigint) as x,
         cast(floor(sum(v) * 100) as bigint) as y
  from ev join first on ev.user_id = first.user_id
  group by ev.user_id
),
agg as (
  select count(*) as m,
         sum(cast(x as decimal(38,0))) as sx,
         sum(cast(y as decimal(38,0))) as sy,
         sum(cast(x * y as decimal(38,0))) as sxy,
         sum(cast(x * x as decimal(38,0))) as sxx,
         sum(cast(y * y as decimal(38,0))) as syy
  from per
)
select cast(m as bigint) as n_users, {_CORR_PROJ[0]}
from agg
"""


# --- session-71: rolling revenue, error budget burn -------------------------


def q_event_rolling_revenue_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-OBSERVED-day revenue: per day, that day's cents and
    the ROWS-frame trailing week (6 preceding + current over the
    bounded daily rollup — the event_dau_forecast_backtest discipline:
    an explicit ROWS frame over observed days, never RANGE over
    wall-clock, so gaps don't silently shrink the window) — the
    smoothed topline the daily number is too noisy to read. Integer
    cents throughout."""
    daily = _t(spark, sf_dir, "events").selectExpr(
        "cast(unix_millis(cast(ts as timestamp)) div 86400000 as bigint)"
        " as day",
        "cast(value as decimal(18,4)) as v",
    ).groupBy("day").agg(
        F.expr("cast(floor(sum(v) * 100) as bigint)").alias("day_cents")
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.withColumn(
        "trailing_7d_cents", F.sum("day_cents").over(w).cast("long")
    ).withColumn(
        "n_days_in_window", F.count("*").over(w).cast("long")
    ).selectExpr(
        "day", "day_cents", "trailing_7d_cents", "n_days_in_window"
    )


SQL_EVENT_ROLLING_REVENUE_7D = """
with daily as (
  select epoch_ms(ts) // 86400000 as day,
         cast(floor(sum(value::DECIMAL(18,4)) * 100) as bigint) as day_cents
  from events group by 1
)
select day::BIGINT as day, day_cents,
       sum(day_cents) over (
         order by day rows between 6 preceding and current row
       )::BIGINT as trailing_7d_cents,
       count(*) over (
         order by day rows between 6 preceding and current row
       )::BIGINT as n_days_in_window
from daily
"""


# --- session-76: 24-hour autocorrelation ------------------------------------


def q_event_hourly_autocorr_24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-24 autocorrelation of the hourly load curve: ONE row, the
    Pearson of (events in hour t, events in hour t+24) over all hour
    pairs 24 apart — the statistic that PROVES daily periodicity
    before anyone trusts event_hourly_seasonality's per-hour means or
    the seasonal anomaly baseline. The pair set is the SPARSE key union
    (full-outer on hour vs hour+24, zero-filled): an hour where both t
    and t+24 saw no events contributes no (0,0) pair — deliberate, as
    all-quiet hour pairs carry no periodicity signal; a dense-range
    variant would need a sequence(lo, hi) spine in both engines."""
    hourly = _t(spark, sf_dir, "events").selectExpr(
        "cast(unix_millis(cast(ts as timestamp)) div 3600000 as bigint)"
        " as hour_b"
    ).groupBy("hour_b").agg(F.count("*").cast("long").alias("n"))
    span = hourly.agg(
        F.min("hour_b").alias("lo"), F.max("hour_b").alias("hi")
    )
    a = hourly.selectExpr("hour_b", "n as x")
    b = hourly.selectExpr("hour_b - 24 as hour_b", "n as y")
    per = (
        a.join(b, "hour_b", "full_outer")
        .crossJoin(F.broadcast(span))
        .filter(
            # keep only hours whose lag-24 partner is inside the series
            F.expr("hour_b >= lo and hour_b + 24 <= hi")
        )
        .selectExpr("coalesce(x, 0) as x", "coalesce(y, 0) as y")
    )
    dec = "cast({e} as decimal(38,0))"
    agg = per.agg(
        F.count("*").alias("m"),
        F.sum(F.expr(dec.format(e="x"))).alias("sx"),
        F.sum(F.expr(dec.format(e="y"))).alias("sy"),
        F.sum(F.expr(dec.format(e="x * y"))).alias("sxy"),
        F.sum(F.expr(dec.format(e="x * x"))).alias("sxx"),
        F.sum(F.expr(dec.format(e="y * y"))).alias("syy"),
    )
    return agg.selectExpr("cast(m as bigint) as n_hour_pairs", *_CORR_PROJ)


SQL_EVENT_HOURLY_AUTOCORR_24 = f"""
with hourly as (
  select epoch_ms(ts) // 3600000 as hour_b, count(*)::BIGINT as n
  from events group by 1
),
span as (select min(hour_b) as lo, max(hour_b) as hi from hourly),
a as (select hour_b, n as x from hourly),
b as (select hour_b - 24 as hour_b, n as y from hourly),
per as (
  select coalesce(x, 0) as x, coalesce(y, 0) as y
  from a full outer join b on a.hour_b = b.hour_b
       cross join span
  where coalesce(a.hour_b, b.hour_b) >= lo
    and coalesce(a.hour_b, b.hour_b) + 24 <= hi
),
agg as (
  select count(*) as m,
         sum(cast(x as decimal(38,0))) as sx,
         sum(cast(y as decimal(38,0))) as sy,
         sum(cast(x * y as decimal(38,0))) as sxy,
         sum(cast(x * x as decimal(38,0))) as sxx,
         sum(cast(y * y as decimal(38,0))) as syy
  from per
)
select cast(m as bigint) as n_hour_pairs, {_CORR_PROJ[0]}
from agg
"""
