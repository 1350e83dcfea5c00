"""Priority-queue admission — top-k per host per round (the politeness admit).

Reference analog: the crawl loop's deterministic visit order
(/root/reference/crawler.py:41-45,72-73); the priority key is
(seed_index, depth, url) per SURVEY.md O2.

Three implementations of one contract, selected by config:

* ``admit_window`` — ``row_number()`` over ``Window.partitionBy(host)``:
  the idiomatic plan; one shuffle on host.
* ``admit_window_salted`` — hot-host skew breaker: a first pass takes the
  top-(budget) within each (host, salt) sub-group — salt = murmur3(url) % s,
  deterministic — bounding any host's final-window input to budget*s rows;
  the second pass is the exact per-host window on that reduced set. Same
  output as ``admit_window`` for every input (the global per-host top-k is
  contained in the union of salted top-ks since each salted group keeps k).
* ``admit_arrow`` — the same admission evaluated inside a vectorized
  ``applyInPandas`` per host (north rule: budgets enforced in Arrow UDFs);
  used to cross-check the window plans in tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PRIORITY_COLS = ["seed_index", "depth", "url"]


def admit_window(cand: DataFrame, budget_col: str = "budget") -> DataFrame:
    w = Window.partitionBy("host").orderBy(*[F.col(c) for c in PRIORITY_COLS])
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col(budget_col))
        .drop("__rn")
    )


def admit_window_salted(
    cand: DataFrame, n_salts: int, budget_col: str = "budget"
) -> DataFrame:
    salted = cand.withColumn("__salt", F.pmod(F.hash("url"), F.lit(n_salts)))
    w1 = Window.partitionBy("host", "__salt").orderBy(*[F.col(c) for c in PRIORITY_COLS])
    pre = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= F.col(budget_col))
        .drop("__rn", "__salt")
    )
    return admit_window(pre, budget_col)


def admit_arrow(cand: DataFrame, budget_col: str = "budget") -> DataFrame:
    schema = cand.schema

    def _admit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(PRIORITY_COLS, kind="mergesort")
        k = int(pdf[budget_col].iloc[0]) if len(pdf) else 0
        return pdf.head(k)

    return cand.groupBy("host").applyInPandas(_admit, schema)


def recrawl_due(
    fetched: DataFrame, current_round: int, interval: int, per_host_cap: int
) -> DataFrame:
    """Freshness scheduling — which fetched URLs to RE-crawl this round.

    A URL falls due when its latest fetch is ``interval`` or more rounds old;
    due URLs are ranked per host oldest-first (url tiebreak for determinism)
    and capped at ``per_host_cap`` per round so refresh traffic honors the
    same politeness shape as discovery. Output: (url, host, last_round, age,
    refresh_rank).

    Composes with the deletable seen tier: feed the admitted urls'
    hashes to ``cuckoo.delete_many`` and the fast-path seen filter re-admits
    exactly these URLs next round (``test_delete_then_filter_readmits_due``).

    Scale shape: one groupBy(url) with map-side combine for latest-fetch,
    one window shuffle on host — both on O(corpus) keys, no joins.
    """
    latest = fetched.groupBy("url").agg(
        F.max("round").alias("last_round"), F.min("host").alias("host")
    )
    due = latest.filter(F.lit(current_round) - F.col("last_round") >= interval)
    w = Window.partitionBy("host").orderBy("last_round", "url")
    return (
        due.withColumn("refresh_rank", F.row_number().over(w))
        .filter(F.col("refresh_rank") <= per_host_cap)
        .select(
            "url",
            "host",
            "last_round",
            (F.lit(current_round) - F.col("last_round")).alias("age"),
            "refresh_rank",
        )
    )


def admit(
    cand: DataFrame, impl: str = "window", n_salts: int = 1, budget_col: str = "budget"
) -> DataFrame:
    if impl == "arrow":
        return admit_arrow(cand, budget_col)
    if n_salts > 1:
        return admit_window_salted(cand, n_salts, budget_col)
    return admit_window(cand, budget_col)


def bandwidth_admit(
    cand: DataFrame, byte_budget: int, est_col: str = "est_bytes"
) -> DataFrame:
    """Per-host BYTE-budget admission — the bandwidth-aware politeness tier.

    ``admit_window`` caps request COUNT per host; real crawl budgets are
    bytes (a host serving 10 MB pages exhausts its politeness allowance in
    far fewer requests). Candidates are taken in priority order per host
    while the running byte total stays within ``byte_budget``; the first
    overflowing candidate and everything after it wait for the next round.

    Same shape as admit_window — one shuffle on host, a running-sum window
    instead of row_number — so the salting skew-breaker composes the same
    way. Integer arithmetic only (exact at any parallelism).
    """
    w = (
        Window.partitionBy("host")
        .orderBy(*[F.col(c) for c in PRIORITY_COLS])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cand.withColumn("cum_bytes", F.sum(F.col(est_col)).over(w))
        .filter(F.col("cum_bytes") <= F.lit(byte_budget))
    )


def adaptive_delay(
    fetch_log: DataFrame,
    base_ms: int = 500,
    min_ms: int = 200,
    max_ms: int = 5000,
    lat_col: str = "latency_ms",
    err_col: str = "is_err",
) -> DataFrame:
    """Latency-adaptive per-host crawl delay (AIMD-flavored politeness).

    The reference crawler sleeps a fixed interval between requests
    (/root/reference/crawler.py fetch loop); a web-scale engine instead
    derives each host's delay from its OBSERVED behavior: slow or erroring
    hosts get backed off, fast healthy ones get the floor. Rule (exact
    integer arithmetic, bit-identical across engines at any parallelism):

      raw   = (2 * sum(latency_ms)) div n_fetches          -- 2x mean
      raw2  = raw * 2 if 5 * n_errs > n_fetches else raw   -- err_rate > 20%
      delay = clamp(min_ms, max_ms, greatest(raw2, base_ms applies only
              when the host has no observations -- absent hosts keep base)

    Scale shape: ONE map-side-combined groupBy(host) over the fetch log;
    output is O(hosts). No floats anywhere (integer div is exact; a decimal
    mean would hit cross-engine division-precision rules).
    """
    agg = fetch_log.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum(F.col(lat_col).cast("long")).alias("sum_latency"),
        F.sum(F.col(err_col).cast("long")).alias("n_errs"),
    )
    # integral `div`, not `/`: long / long is DOUBLE in Spark, and a double
    # round-trip loses exactness once sums pass 2^53 at real corpus sizes
    raw = F.expr("(2 * sum_latency) div n_fetches")
    bumped = F.when(F.lit(5) * F.col("n_errs") > F.col("n_fetches"), raw * 2).otherwise(raw)
    delay = F.least(F.lit(max_ms).cast("long"), F.greatest(F.lit(min_ms).cast("long"), bumped))
    return agg.select(
        "host",
        "n_fetches",
        "n_errs",
        delay.alias("delay_ms"),
    )


def allocate_quota(host_scores: DataFrame, budget: int, score_col: str = "score") -> DataFrame:
    """Global fetch-quota allocation across hosts by largest-remainder method.

    Given an integer quality ``score`` per host and a round-wide fetch
    ``budget``, allocate per-host quotas proportional to score with the
    apportionment remainder going to the largest fractional parts — the
    deterministic way to turn host_quality_rollup scores into the
    ``budget`` column the admit tier consumes, without floats:

      base_h  = (budget * s_h) div total
      rem_h   = (budget * s_h) mod total         -- fractional part * total
      extra_h = 1 for the (budget - sum(base)) hosts with largest rem
                (host name breaks ties), else 0

    sum(quota) == budget exactly. Scale shape: two single-row aggregates
    broadcast back (the stats.py global_totals pattern), and the remainder
    RANK comes from the barrier-free scalable seq stamp — NOT a global
    ``Window.orderBy`` (a one-task funnel over all hosts; the same reason
    the fluency ntile was rewritten, CLAUDE.md r4). Scores arrive
    pre-aggregated (one groupBy upstream), so everything here is O(hosts).
    """
    from .ordering import assign_seq_scalable

    totals = host_scores.agg(
        F.sum(F.col(score_col).cast("long")).alias("total_score")
    )
    j = host_scores.crossJoin(F.broadcast(totals)).select(
        "host",
        F.col(score_col).cast("long").alias("score"),
        F.expr(f"(cast({budget} as bigint) * {score_col}) div total_score").alias("base_q"),
        F.expr(f"(cast({budget} as bigint) * {score_col}) % total_score").alias("rem"),
        "total_score",
    )
    leftover = j.agg((F.lit(budget) - F.sum("base_q")).cast("long").alias("leftover"))
    # descending-remainder rank as an ascending stamp over (total-rem, host):
    # (neg_rem, host) is a unique key since host is unique per row
    ranked = assign_seq_scalable(
        j.withColumn("neg_rem", F.col("total_score") - F.col("rem")),
        ["neg_rem", "host"],
        seq_col="rem_rank0",
    )
    out = ranked.crossJoin(F.broadcast(leftover)).withColumn(
        "quota",
        F.col("base_q")
        + F.when(F.col("rem_rank0") < F.col("leftover"), F.lit(1)).otherwise(F.lit(0)),
    )
    return out.select("host", "score", "base_q", "quota")


def hostload_binpack(frontier: DataFrame, n_slots: int) -> DataFrame:
    """Assign hosts to ``n_slots`` fetcher slots — serpentine LPT packing.

    A politeness-correct fetcher pins each host to exactly ONE slot (so
    per-host delays serialize naturally); the scheduling problem is then
    multiprocessor makespan: spread host loads so no slot becomes the
    straggler. Sorted-descending serpentine (boustrophedon) assignment is
    the classic deterministic approximation: rank hosts by pending count
    descending, deal rank 0..n-1 left-to-right, rank n..2n-1 right-to-left,
    and so on — each pass pairs the currently-lightest slots with the
    currently-heaviest hosts.

    Scale shape: one map-side-combined groupBy builds the O(hosts) load
    table; the descending rank comes from the barrier-free scalable seq
    stamp (NOT a global ``Window.orderBy`` funnel — same rationale as
    ``allocate_quota``); the slot arithmetic is pure per-row codegen.
    """
    from .ordering import assign_seq_scalable

    loads = frontier.groupBy("host").agg(F.count("*").alias("pending"))
    ranked = assign_seq_scalable(
        loads.withColumn("neg_pending", -F.col("pending")),
        ["neg_pending", "host"],
        seq_col="load_rank0",
    )
    pos = F.col("load_rank0") % n_slots
    pas = F.expr(f"load_rank0 div {n_slots}")
    slot = F.when(pas % 2 == 0, pos).otherwise(F.lit(n_slots - 1) - pos)
    return ranked.select(
        "host",
        "pending",
        F.col("load_rank0").cast("long").alias("load_rank0"),
        slot.cast("long").alias("slot"),
    )


def latency_quantiles(log: DataFrame) -> DataFrame:
    """Per-host exact latency percentiles — (host, n_fetches, p50_ms,
    p95_ms, max_ms), the crawl-operations dashboard row behind the
    adaptive-delay controller (``adaptive_delay`` keys off the MEAN; tail
    latency is what actually trips politeness alarms).

    EXACT discrete quantiles (value at rank ``(n-1)*p div 100 + 1``), not
    ``percentile_approx``: the approximate sketch is engine-specific and
    can never match a cross-engine oracle bit-for-bit, while the discrete
    definition is pure integer arithmetic over ranked rows.

    Scale shape: one shuffle partitioned BY HOST (the politeness partition
    key the whole crawl plan already uses), a per-host sort for
    ``row_number`` + per-host ``count`` in the SAME window partition (one
    exchange, two window functions), filter to the three target ranks,
    then a map-side-combined groupBy on host. Per-host state is the sort
    buffer — exact per-host quantiles require per-host order by
    definition; a pathological mega-host is bounded upstream by the
    per-host admission caps, never by this rollup.

    Ties: ordering by latency alone makes row order among equal values
    nondeterministic, but the VALUE at any rank is deterministic — the
    only thing projected out.
    """
    w = Window.partitionBy("host").orderBy("latency_ms")
    wall = Window.partitionBy("host")
    idx = "((n - 1) * {p}) div 100 + 1"
    x = (
        log.select("host", "latency_ms")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wall))
    )
    at = lambda p: F.col("rn") == F.expr(idx.format(p=p))  # noqa: E731
    keep = x.filter(at(50) | at(95) | (F.col("rn") == F.col("n")))
    pick = lambda c: F.max(F.when(c, F.col("latency_ms"))).cast("long")  # noqa: E731
    return keep.groupBy("host").agg(
        F.max("n").cast("long").alias("n_fetches"),
        pick(at(50)).alias("p50_ms"),
        pick(at(95)).alias("p95_ms"),
        pick(F.col("rn") == F.col("n")).alias("max_ms"),
    )


def latency_quantiles_sql(log_cte: str) -> str:
    """Oracle twin of ``latency_quantiles`` — same discrete-rank
    definition (DuckDB's quantile_disc interpolates differently; the
    window form is the shared grammar)."""
    return f"""
with l as ({log_cte}),
x as (
  select host, latency_ms,
         row_number() over (partition by host order by latency_ms) as rn,
         count(*) over (partition by host) as n
  from l
)
select host, max(n)::BIGINT as n_fetches,
       max(case when rn = ((n - 1) * 50) // 100 + 1 then latency_ms end)::BIGINT as p50_ms,
       max(case when rn = ((n - 1) * 95) // 100 + 1 then latency_ms end)::BIGINT as p95_ms,
       max(case when rn = n then latency_ms end)::BIGINT as max_ms
from x
where rn = ((n - 1) * 50) // 100 + 1
   or rn = ((n - 1) * 95) // 100 + 1
   or rn = n
group by host
"""


def host_skew_gini(frontier: DataFrame) -> DataFrame:
    """Frontier skew profile — ONE row (n_hosts, total_pending, gini): the
    Gini coefficient of the per-host pending-load distribution. The number
    a crawl operator watches to decide when to salt hot hosts / rebalance
    fetcher slots: 0 = perfectly even frontier, ->1 = a few mega-hosts own
    the queue (the regime where ``admit_salted`` and AQE skew handling
    start paying for themselves).

    Exactness without ``ln`` (the r4 lesson — log-domain scores break the
    cross-engine repr() gate): Gini over sorted loads is pure rational
    arithmetic, G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) with ranks
    i ascending. Both sums are DECIMAL(38,0)-exact (associative, any fold
    order); ONE double division at the end + round. Tie order between
    equal loads cannot change sum(i*x_i), so the (pending, host) total
    order is deterministic AND tie-robust.

    Scale shape: one map-side-combined groupBy builds the O(hosts) load
    table; the ascending rank is the barrier-free scalable stamp (never a
    global ``Window.orderBy`` funnel over 10^8 hosts); the final agg is a
    single-row reduce.
    """
    from .ordering import assign_seq_scalable

    loads = frontier.groupBy("host").agg(F.count("*").alias("pending"))
    ranked = assign_seq_scalable(loads, ["pending", "host"], seq_col="rank0")
    dec = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    agg = ranked.agg(
        F.count("*").cast("long").alias("n_hosts"),
        F.sum(F.col("pending").cast("decimal(38,0)")).alias("tot"),
        F.sum(dec(F.col("rank0") + 1) * dec(F.col("pending"))).alias("iwx"),
    )
    num = F.lit(2) * F.col("iwx") - (F.col("n_hosts") + 1) * F.col("tot")
    den = F.col("n_hosts") * F.col("tot")
    return agg.select(
        "n_hosts",
        F.col("tot").cast("long").alias("total_pending"),
        F.round(num.cast("double") / den.cast("double"), 6).alias("gini"),
    )


def host_skew_gini_sql(frontier_cte: str) -> str:
    """Oracle twin — identical rational-arithmetic Gini."""
    return f"""
with f as ({frontier_cte}),
loads as (select host, count(*)::BIGINT as pending from f group by host),
ranked as (
  select pending,
         row_number() over (order by pending, host) as rnk
  from loads
)
select count(*)::BIGINT as n_hosts,
       cast(sum(pending::DECIMAL(38,0)) as BIGINT) as total_pending,
       round(cast(2 * sum(rnk::DECIMAL(19,0) * pending::DECIMAL(19,0))
                  - (count(*) + 1) * sum(pending::DECIMAL(38,0)) as DOUBLE)
             / cast(count(*) * sum(pending::DECIMAL(38,0)) as DOUBLE), 6)
         as gini
from ranked
"""


def retry_backoff(
    attempts: DataFrame, max_retries: int = 2, cap_exp: int = 6
) -> DataFrame:
    """Fetch-failure lifecycle — per-URL retry state from the attempt log.

    attempts(url, attempt_round, ok) -> (url, n_attempts, consec_fails,
    last_round, status, next_round): ``consec_fails`` counts failures
    SINCE the last success (a recovered URL resets its backoff — counting
    lifetime failures would permanently penalize flaky-but-alive hosts),
    ``status`` is 'ok' / 'retry' / 'give_up' (consec_fails > max_retries),
    and a retry is scheduled at ``last_round + 2^min(consec_fails,
    cap_exp)`` — truncated binary exponential backoff.

    Exactness: the backoff is a dyadic INTEGER (shiftleft, never
    ``pow``-via-double, same discipline as the HLL dyadic terms); every
    output is integer or a small enum string.

    Scale shape: two map-side-combined groupBys and one equi self-join,
    ALL on the url shuffle key (AQE reuses the exchange); no window, no
    broadcast of the corpus-sized attempt log.
    """
    agg = attempts.groupBy("url").agg(
        F.count("*").cast("long").alias("n_attempts"),
        F.max("attempt_round").cast("long").alias("last_round"),
        F.max(F.when(F.col("ok"), F.col("attempt_round"))).alias("last_ok"),
    )
    fails = (
        attempts.join(agg.select("url", "last_ok"), "url")
        .filter(
            (~F.col("ok"))
            & (F.col("attempt_round") > F.coalesce(F.col("last_ok"), F.lit(-1)))
        )
        .groupBy("url")
        .agg(F.count("*").cast("long").alias("consec_fails"))
    )
    out = agg.join(fails, "url", "left").withColumn(
        "consec_fails", F.coalesce(F.col("consec_fails"), F.lit(0)).cast("long")
    )
    status = (
        F.when(F.col("consec_fails") == 0, F.lit("ok"))
        .when(F.col("consec_fails") > max_retries, F.lit("give_up"))
        .otherwise(F.lit("retry"))
    )
    # F.shiftleft takes a literal int for numBits; the column-shift form
    # goes through expr
    delay = F.expr(
        f"shiftleft(1L, cast(least(consec_fails, {cap_exp}) as int))"
    )
    return out.select(
        "url",
        "n_attempts",
        "consec_fails",
        "last_round",
        status.alias("status"),
        F.when(status == "retry", F.col("last_round") + delay)
        .cast("long")
        .alias("next_round"),
    )


def retry_backoff_sql(
    attempts_cte: str, max_retries: int = 2, cap_exp: int = 6
) -> str:
    """Oracle twin — identical reset-on-success + dyadic backoff."""
    return f"""
with a as ({attempts_cte}),
g as (
  select url, count(*)::BIGINT as n_attempts,
         max(attempt_round)::BIGINT as last_round,
         max(case when ok then attempt_round end) as last_ok
  from a group by url
),
f as (
  select a.url, count(*)::BIGINT as consec_fails
  from a join g using (url)
  where not a.ok and a.attempt_round > coalesce(g.last_ok, -1)
  group by a.url
),
s as (
  select g.url, g.n_attempts, g.last_round,
         coalesce(f.consec_fails, 0)::BIGINT as consec_fails
  from g left join f using (url)
)
select url, n_attempts, consec_fails, last_round,
       case when consec_fails = 0 then 'ok'
            when consec_fails > {max_retries} then 'give_up'
            else 'retry' end as status,
       case when consec_fails > 0 and consec_fails <= {max_retries}
            then last_round + (1 << least(consec_fails, {cap_exp}))
            end::BIGINT as next_round
from s
"""


def priority_admit(
    frontier: DataFrame, budget: int, priority_col: str = "priority", id_col: str = "url"
) -> DataFrame:
    """Global top-``budget`` frontier pop WITHOUT a total sort — the
    scale-correct way to take the next fetch batch off a 10^10-row
    priority queue (reference analog: the crawl loop pops its worklist in
    priority order, reference crawler.py:41-45; a naive orderBy().limit()
    funnels the whole frontier through one ordering).

    Scale shape: (1) ONE map-side-combined groupBy builds the priority
    HISTOGRAM — O(distinct priorities) rows, bounded by the score domain,
    not the frontier; (2) the admission threshold is read off the
    histogram's descending cumulative sum (a window over the tiny
    histogram, never the data); (3) the 1-row threshold broadcast-joins
    back: rows strictly above the threshold priority are admitted
    map-side with NO shuffle, and only the BOUNDARY CLASS (the single
    priority value where the cumulative crosses the budget) is tie-broken
    by a window partitioned on that one priority — O(budget)-ish rows,
    not the frontier. If the frontier fits the budget entirely, everything
    admits (null threshold).

    Tie-break contract: (priority desc, id asc) — identical to the oracle's
    row_number formulation.
    """
    p, i = F.col(priority_col), F.col(id_col)
    hist = frontier.groupBy(priority_col).agg(F.count("*").alias("__n"))
    wcum = Window.orderBy(F.desc(priority_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    thr = (
        hist.withColumn("__cum", F.sum("__n").over(wcum))
        .filter(F.col("__cum") >= budget)
        .orderBy(F.desc(priority_col))
        .limit(1)
        .select(
            p.alias("__thr_p"),
            (F.lit(budget) - (F.col("__cum") - F.col("__n"))).alias("__room"),
        )
    )
    tagged = frontier.join(F.broadcast(thr), how="cross")
    above = tagged.filter(p > F.col("__thr_p")).select(frontier.columns)
    boundary = tagged.filter(p == F.col("__thr_p"))
    wb = Window.partitionBy(priority_col).orderBy(i.asc())
    kept_boundary = (
        boundary.withColumn("__rn", F.row_number().over(wb))
        .filter(F.col("__rn") <= F.col("__room"))
        .select(frontier.columns)
    )
    admitted = above.unionByName(kept_boundary)
    # empty thr (frontier smaller than budget) => cross join yields zero
    # rows; admit the whole frontier via anti-join against the (then
    # empty) admitted set's complement — cheaper: union the full frontier
    # only when thr is empty, decided by a 1-row driver check on the
    # already-tiny histogram aggregate.
    total_under = (
        hist.agg(F.sum("__n").alias("__t")).filter(F.col("__t") <= budget).count()
    )
    return frontier if total_under else admitted


def priority_admit_sql(
    frontier_cte: str, budget: int, priority_col: str = "priority", id_col: str = "url"
) -> str:
    """Oracle twin: the admitted set IS the global top-``budget`` by
    (priority desc, id asc)."""
    return f"""
with f as ({frontier_cte}),
r as (
  select *, row_number() over (
    order by {priority_col} desc, {id_col} asc
  ) as __rn from f
)
select * exclude (__rn) from r where __rn <= {budget}
"""


RING_VNODES = 4


def consistent_hash_assign(
    hosts: DataFrame, n_shards: int, n_shards_after: int, n_vnodes: int = RING_VNODES
) -> DataFrame:
    """Consistent-hash host->crawler-shard assignment, before and after a
    reshard — (host, shard_before, shard_after, moved). The crawl fleet's
    partition map: politeness requires one host to live on one fetcher,
    and growing the fleet from K to K' shards must move only ~1/K' of
    hosts (hash(host) % K would reshuffle nearly everything).

    Ring: ``n_vnodes`` points per shard at md5('s:'||shard||':'||vnode)
    (the cross-engine 32-bit md5 kit); a host lands on the clockwise
    successor of md5(host), wrapping past the top. Scale shape: the ring
    is K'*V rows — broadcast — so assignment is a map-side
    broadcast-nested-loop against a ~dozens-row build side followed by a
    per-host argmin window over at most K'*V candidates per host (never a
    host x host shuffle). Both epochs read the SAME joined candidates;
    the before-epoch simply ignores points of shards >= ``n_shards``.
    """
    spark = hosts.sparkSession
    ring = (
        spark.range(n_shards_after)
        .withColumnRenamed("id", "shard")
        .select(
            "shard",
            F.explode(F.sequence(F.lit(0), F.lit(n_vnodes - 1))).alias("vnode"),
        )
        .select(
            "shard",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("s:"),
                            F.col("shard").cast("string"),
                            F.lit(":"),
                            F.col("vnode").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("point"),
        )
    )
    h = hosts.select("host").distinct().select(
        "host",
        F.conv(F.substring(F.md5(F.col("host")), 1, 8), 16, 10)
        .cast("long")
        .alias("hp"),
    )
    cand = h.join(F.broadcast(ring), how="cross")
    wrap = F.when(F.col("point") >= F.col("hp"), F.lit(0)).otherwise(F.lit(1))

    def _pick(cands: DataFrame, out: str) -> DataFrame:
        w = Window.partitionBy("host").orderBy("__wrap", "point", "shard")
        return (
            cands.withColumn("__wrap", wrap)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("host", F.col("shard").cast("long").alias(out))
        )

    before = _pick(cand.filter(F.col("shard") < n_shards), "shard_before")
    after = _pick(cand, "shard_after")
    return before.join(after, "host").select(
        "host",
        "shard_before",
        "shard_after",
        (F.col("shard_before") != F.col("shard_after")).alias("moved"),
    )


def consistent_hash_sql(
    hosts_cte: str, n_shards: int, n_shards_after: int, n_vnodes: int = RING_VNODES
) -> str:
    """Oracle twin: identical ring, hash kit, and wrap-aware argmin."""
    return f"""
with hraw as ({hosts_cte}),
h as (
  select host, ('0x' || substr(md5(host), 1, 8))::BIGINT as hp
  from (select distinct host from hraw)
),
ring as (
  select s.shard, ('0x' || substr(md5(
           's:' || s.shard::VARCHAR || ':' || v.vnode::VARCHAR
         ), 1, 8))::BIGINT as point
  from (select unnest(range({n_shards_after})) as shard) s
  cross join (select unnest(range({n_vnodes})) as vnode) v
),
cand as (
  select h.host, h.hp, r.shard, r.point,
         case when r.point >= h.hp then 0 else 1 end as wrap
  from h cross join ring r
),
pick_before as (
  select host, shard::BIGINT as shard_before from (
    select host, shard, row_number() over (
      partition by host order by wrap, point, shard
    ) as rn from cand where shard < {n_shards}
  ) where rn = 1
),
pick_after as (
  select host, shard::BIGINT as shard_after from (
    select host, shard, row_number() over (
      partition by host order by wrap, point, shard
    ) as rn from cand
  ) where rn = 1
)
select b.host, b.shard_before, a.shard_after,
       (b.shard_before <> a.shard_after) as moved
from pick_before b join pick_after a using (host)
"""


def token_bucket_pacing(
    reqs: DataFrame,
    capacity: int,
    refill: int,
    host_col: str = "host",
    round_col: str = "rnd",
) -> DataFrame:
    """Per-host token-bucket pacing across scheduling rounds — (host, rnd,
    requested, admitted, denied, tokens_after). THE politeness primitive
    the reference enforces with wall-clock sleeps (reference
    crawler.py:105-139 per-venue fan-out + delay): a bucket starts full at
    ``capacity``, refills ``refill`` tokens per round (clamped at
    capacity), and each round admits min(requested, tokens).

    The recurrence is a running CLAMP — non-associative, so it cannot be
    a window aggregate. This is the sanctioned Arrow path (north rule:
    budgets enforced in vectorized pandas UDFs, never per-row Python):
    one ``applyInPandas`` per host group, a pure-integer sequential fold
    over that host's ~handful of round rows. Scale shape: the input is
    the PRE-AGGREGATED (host, round) request table — O(hosts * rounds),
    orders of magnitude smaller than the frontier — so the per-host
    shuffle moves rollup rows, not URLs; skew is bounded by rounds per
    host, not request volume. Exact integer arithmetic end-to-end, so the
    DuckDB recursive-CTE oracle matches bit-for-bit.
    """
    out_schema = (
        f"{host_col} string, {round_col} long, requested long, "
        "admitted long, denied long, tokens_after long"
    )

    def _pace(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(round_col).reset_index(drop=True)
        toks = capacity
        admitted, tokens_after = [], []
        for i, req in enumerate(pdf["requested"]):
            if i:
                toks = min(capacity, toks + refill)
            adm = min(int(req), toks)
            toks -= adm
            admitted.append(adm)
            tokens_after.append(toks)
        pdf["admitted"] = admitted
        pdf["denied"] = pdf["requested"] - pdf["admitted"]
        pdf["tokens_after"] = tokens_after
        return pdf[
            [host_col, round_col, "requested", "admitted", "denied", "tokens_after"]
        ]

    return reqs.groupBy(host_col).applyInPandas(_pace, out_schema)


def token_bucket_pacing_sql(
    reqs_cte: str, capacity: int, refill: int
) -> str:
    """Oracle twin: the same clamp recurrence as a recursive CTE stepping
    rnd -> rnd + 1 per host (rounds must be dense per host)."""
    return f"""
with recursive reqs as ({reqs_cte}),
w(host, rnd, requested, admitted, tokens_after) as (
  select host, rnd, requested,
         least(requested, {capacity}) as admitted,
         {capacity} - least(requested, {capacity}) as tokens_after
  from reqs where rnd = 0
  union all
  select r.host, r.rnd, r.requested,
         least(r.requested, least(w.tokens_after + {refill}, {capacity}))
           as admitted,
         least(w.tokens_after + {refill}, {capacity})
           - least(r.requested, least(w.tokens_after + {refill}, {capacity}))
           as tokens_after
  from w join reqs r on r.host = w.host and r.rnd = w.rnd + 1
)
select host, rnd::BIGINT as rnd, requested::BIGINT as requested,
       admitted::BIGINT as admitted,
       (requested - admitted)::BIGINT as denied,
       tokens_after::BIGINT as tokens_after
from w
"""


def politeness_schedule(
    frontier: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    delay_col: str = "delay_ms",
) -> DataFrame:
    """Fetch-time assignment for an admitted batch — (url, host, fetch_rank,
    scheduled_ms): the i-th URL of a host fires at (i-1) * crawl_delay,
    turning the per-host delay budget into explicit timestamps a fetcher
    fleet can execute without coordination.

    Scale shape: ONE window partitioned by host over the ADMITTED batch
    (already budget-bounded per host by the admit tier, so no skew
    funnel; for unbounded inputs the salted variant admit_window_salted
    is the precedent). scheduled_ms is exact integer arithmetic.
    """
    w = Window.partitionBy(host_col).orderBy(F.col(url_col).asc())
    rank = F.row_number().over(w)
    return frontier.select(
        url_col,
        host_col,
        rank.cast("long").alias("fetch_rank"),
        ((rank - 1).cast("long") * F.col(delay_col).cast("long")).alias(
            "scheduled_ms"
        ),
    )


def politeness_schedule_sql(frontier_cte: str) -> str:
    """Oracle twin: identical rank * delay arithmetic."""
    return f"""
with f as ({frontier_cte}),
r as (
  select url, host, delay_ms,
         row_number() over (partition by host order by url asc) as rk
  from f
)
select url, host, rk::BIGINT as fetch_rank,
       ((rk - 1) * delay_ms)::BIGINT as scheduled_ms
from r
"""


def subnet_budget(
    frontier: DataFrame, subnet_cap: int, host_col: str = "host"
) -> DataFrame:
    """Per-/24-subnet politeness rollup — (host, subnet, pending,
    subnet_hosts, subnet_pending, host_cap). Host-level delays are not
    enough on shared hosting: a thousand vhosts behind one /24 will melt
    the box even if each host is individually polite, so real crawlers
    budget per SUBNET and apportion that budget across the subnet's
    hosts proportionally to pending load (floor, min 1 so no host
    starves).

    Resolution is a deterministic md5 stand-in for DNS (24-bit subnet id
    from the host digest — the sandbox has no resolver; the hash IS the
    documented fake). Scale shape: one map-side-combined groupBy to the
    host rollup, one to the subnet rollup (O(subnets) rows), one equi
    join back — integer arithmetic end-to-end.
    """
    loads = frontier.groupBy(host_col).agg(F.count("*").alias("pending"))
    withnet = loads.withColumn(
        "subnet",
        F.conv(F.substring(F.md5(F.col(host_col)), 1, 6), 16, 10).cast("long"),
    )
    nets = withnet.groupBy("subnet").agg(
        F.count("*").alias("subnet_hosts"),
        F.sum("pending").alias("subnet_pending"),
    )
    return withnet.join(nets, "subnet").select(
        host_col,
        "subnet",
        F.col("pending").cast("long").alias("pending"),
        F.col("subnet_hosts").cast("long").alias("subnet_hosts"),
        F.col("subnet_pending").cast("long").alias("subnet_pending"),
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"({subnet_cap} * pending) div subnet_pending"),
        ).alias("host_cap"),
    )


def subnet_budget_sql(frontier_cte: str, subnet_cap: int) -> str:
    """Oracle twin: identical hash kit, rollups, and floor apportionment."""
    return f"""
with f as ({frontier_cte}),
loads as (
  select host, count(*)::BIGINT as pending,
         ('0x' || substr(md5(host), 1, 6))::BIGINT as subnet
  from f group by host
),
nets as (
  select subnet, count(*)::BIGINT as subnet_hosts,
         sum(pending)::BIGINT as subnet_pending
  from loads group by subnet
)
select l.host, l.subnet, l.pending, n.subnet_hosts, n.subnet_pending,
       greatest(1, ({subnet_cap} * l.pending) // n.subnet_pending)::BIGINT
         as host_cap
from loads l join nets n using (subnet)
"""


CB_FAIL_ROUNDS = 3  # consecutive failure rounds that trip the breaker
CB_COOLDOWN = 2     # rounds a tripped breaker stays open


def circuit_breaker(
    outcomes: DataFrame,
    fail_rounds: int = CB_FAIL_ROUNDS,
    cooldown: int = CB_COOLDOWN,
    host_col: str = "host",
    round_col: str = "rnd",
) -> DataFrame:
    """Per-host fetch circuit breaker across scheduling rounds — (host,
    rnd, n_req, n_err, state, allowed, denied). The failure-isolation
    politeness tier the reference lacks entirely (its crawler retries
    unconditionally): a host whose rounds keep majority-failing stops
    receiving traffic for a cooldown, then gets a single half-open probe
    before full traffic resumes.

    State machine, evaluated at each round's START (integer-exact):
      closed     allow all. fail := 2*n_err >= n_req; `fail_rounds`
                 consecutive fails trip the breaker OPEN for `cooldown`.
      open       allow none; after `cooldown` rounds -> half_open.
      half_open  allow ONE probe; fail -> open again, success -> closed.

    Like token_bucket_pacing this is a running non-associative recurrence
    — not a window aggregate — so it is the sanctioned Arrow path: one
    vectorized ``applyInPandas`` per host over the PRE-AGGREGATED (host,
    round) outcome rollup (O(hosts x rounds) rows, never URLs; per-group
    work bounded by rounds, not traffic). The DuckDB oracle is the
    identical recurrence as a recursive CTE, bit-for-bit.
    """
    out_schema = (
        f"{host_col} string, {round_col} long, n_req long, n_err long, "
        "state string, allowed long, denied long"
    )
    labels = {0: "closed", 1: "open", 2: "half_open"}

    def _run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(round_col).reset_index(drop=True)
        s, streak, left = 0, 0, 0
        states, allowed = [], []
        for n_req, n_err in zip(pdf["n_req"], pdf["n_err"]):
            states.append(labels[s])
            fail = 2 * int(n_err) >= int(n_req)
            if s == 0:
                allowed.append(int(n_req))
                streak = streak + 1 if fail else 0
                if streak >= fail_rounds:
                    s, left, streak = 1, cooldown, 0
            elif s == 1:
                allowed.append(0)
                left -= 1
                if left == 0:
                    s = 2
            else:  # half_open
                allowed.append(min(int(n_req), 1))
                s, left = (1, cooldown) if fail else (0, 0)
                streak = 0
        pdf["state"] = states
        pdf["allowed"] = allowed
        pdf["denied"] = pdf["n_req"] - pdf["allowed"]
        return pdf[
            [host_col, round_col, "n_req", "n_err", "state", "allowed", "denied"]
        ]

    return outcomes.groupBy(host_col).applyInPandas(_run, out_schema)


def circuit_breaker_sql(
    outcomes_cte: str, fail_rounds: int = CB_FAIL_ROUNDS, cooldown: int = CB_COOLDOWN
) -> str:
    """Oracle twin: the same state machine as a recursive CTE stepping
    rnd -> rnd + 1 per host (rounds dense per host). Carried columns are
    the NEXT-round state triple (s, streak, open_left); each row also
    emits the state the round STARTED in (that's what admission used)."""
    step = f"""
         case when w.s = 0 then
                case when (case when 2 * r.n_err >= r.n_req then w.streak + 1
                                else 0 end) >= {fail_rounds}
                     then 1 else 0 end
              when w.s = 1 then case when w.open_left - 1 = 0 then 2 else 1 end
              else case when 2 * r.n_err >= r.n_req then 1 else 0 end
         end"""
    streak = f"""
         case when w.s = 0 then
                case when (case when 2 * r.n_err >= r.n_req then w.streak + 1
                                else 0 end) >= {fail_rounds}
                     then 0
                     else case when 2 * r.n_err >= r.n_req then w.streak + 1
                               else 0 end end
              else 0 end"""
    left = f"""
         case when w.s = 0 then
                case when (case when 2 * r.n_err >= r.n_req then w.streak + 1
                                else 0 end) >= {fail_rounds}
                     then {cooldown} else 0 end
              when w.s = 1 then w.open_left - 1
              else case when 2 * r.n_err >= r.n_req then {cooldown} else 0 end
         end"""
    allowed = """
         case when w.s = 0 then r.n_req
              when w.s = 1 then 0
              else least(r.n_req, 1) end"""
    return f"""
with recursive log as ({outcomes_cte}),
w(host, rnd, n_req, n_err, begin_s, allowed, s, streak, open_left) as (
  select host, rnd, n_req, n_err, 0 as begin_s, n_req as allowed,
         case when (case when 2 * n_err >= n_req then 1 else 0 end)
                   >= {fail_rounds} then 1 else 0 end as s,
         case when (case when 2 * n_err >= n_req then 1 else 0 end)
                   >= {fail_rounds} then 0
              else case when 2 * n_err >= n_req then 1 else 0 end end as streak,
         case when (case when 2 * n_err >= n_req then 1 else 0 end)
                   >= {fail_rounds} then {cooldown} else 0 end as open_left
  from log where rnd = 0
  union all
  select r.host, r.rnd, r.n_req, r.n_err, w.s as begin_s,
         ({allowed}) as allowed,
         ({step}) as s, ({streak}) as streak, ({left}) as open_left
  from w join log r on r.host = w.host and r.rnd = w.rnd + 1
)
select host, rnd::BIGINT as rnd, n_req::BIGINT as n_req, n_err::BIGINT as n_err,
       case begin_s when 0 then 'closed' when 1 then 'open'
            else 'half_open' end as state,
       allowed::BIGINT as allowed, (n_req - allowed)::BIGINT as denied
from w
"""


def jain_fairness(per: DataFrame) -> DataFrame:
    """Per-round Jain fairness index over per-host fetch allocations —
    (rnd, n_hosts, total_fetches, jain_ppm) from a (host, rnd, n_fetch)
    rollup. J = (sum x)^2 / (n * sum x^2): 1.0 when every host got the
    same share, -> 1/n when one host took the whole round — the one-number
    politeness-skew alarm a crawl operator watches next to
    crawl_host_skew_gini (Gini reads inequality of the distribution;
    Jain reads how far the ROUND is from its fair allocation).

    All-integer arithmetic (exact at any shuffle order): jain_ppm =
    (total^2 * 1e6) div (n * sum_sq), truncating integer division both
    engines agree on for non-negative operands. BIGINT headroom: safe
    below ~3e6 fetches per round (total^2 * 1e6 < 2^63); a 100 TB
    deployment rounds above that should lift the two products to
    DECIMAL(38,0) (the graph_assortativity recipe) — the fixture and any
    per-round batch this engine schedules stay far under it.

    Scale shape: ONE map-side-combined groupBy per level — (host, rnd)
    counts then rnd moments; no window, no join, no collect.
    """
    agg = per.groupBy("rnd").agg(
        F.count(F.lit(1)).cast("long").alias("n_hosts"),
        F.sum("n_fetch").cast("long").alias("total_fetches"),
        F.sum(F.col("n_fetch") * F.col("n_fetch")).cast("long").alias("__ss"),
    )
    return agg.select(
        F.col("rnd").cast("long").alias("rnd"),
        "n_hosts",
        "total_fetches",
        F.expr(
            "(total_fetches * total_fetches * 1000000) div (n_hosts * __ss)"
        ).cast("long").alias("jain_ppm"),
    )


def jain_fairness_sql(per_cte: str) -> str:
    """Oracle twin of :func:`jain_fairness` over the same (host, rnd,
    n_fetch) rollup CTE."""
    return f"""
with per as ({per_cte}),
agg as (
  select rnd, count(*)::BIGINT as n_hosts,
         sum(n_fetch)::BIGINT as total_fetches,
         sum(n_fetch * n_fetch)::BIGINT as ss
  from per group by rnd
)
select rnd::BIGINT as rnd, n_hosts, total_fetches,
       ((total_fetches * total_fetches * 1000000) // (n_hosts * ss))::BIGINT
         as jain_ppm
from agg
"""
