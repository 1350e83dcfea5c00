"""Per-host fetch-size anomaly detection (2-sigma rule, exact moments).

A crawler watches the content-length distribution per host: a page 2+
standard deviations from its host's mean is a truncated fetch, an error
page served with 200, or an unbounded calendar/trap page — either way a
re-fetch/re-inspect candidate. The reference has no statistical QA tier;
this is the batch twin of that control-plane check over the fetch log.

Scale shape: ONE groupBy on host for the (n, sum, sum-of-squares)
moments (map-side partial combine), then a host-key join back to the
rows — both sides shuffle on the same key, so AQE plans it
co-partitioned; NO broadcast hint (the moments table is corpus-derived:
one row per host, unbounded at web scale — the r3 ngram-jaccard
lesson). Output is only the flagged rows, a vanishing fraction.

Float parity: the moments are exact DECIMAL sums (order-independent);
the 2-sigma predicate is evaluated on their double casts with the SAME
expression text in both engines — per-row double arithmetic is
bit-identical, so the flag set matches exactly. The squared form
rides ``n*x - S1 = n*(x - mean)`` and ``n*S2 - S1^2 = n^2 * var``, so
the 2-sigma test ``(x-mean)^2 > 4*var`` becomes
``(n*x - S1)^2 > 4 * (n*S2 - S1^2)`` — no sqrt, no division.
Integer-only output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: shared predicate + mean snippets — evaluated verbatim by BOTH engines
#: on (x, nd, s1d, s2d) doubles. z = 2 sigma <=> factor 4.
ANOMALY_PRED_EXPR = (
    "(nd * x - s1d) * (nd * x - s1d) > 4.0 * (nd * s2d - s1d * s1d)"
)
MEAN_FLOOR_EXPR = "cast(floor(s1d / nd) as bigint)"


def length_anomaly(rows: DataFrame) -> DataFrame:
    """(host, doc_id, length, n_host, mean_len) for every row whose
    length deviates from its host's mean by more than 2 host standard
    deviations. ``rows`` must carry (host, doc_id, length); hosts with
    n < 2 never flag (variance 0 makes the strict > false).
    """
    r = rows.select(
        "host",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("length").cast("long").alias("length"),
    )
    stats = r.groupBy("host").agg(
        F.count("*").alias("n_host"),
        F.sum(F.col("length").cast("decimal(38,0)")).alias("s1"),
        F.sum(
            (
                F.col("length").cast("decimal(19,0)")
                * F.col("length").cast("decimal(19,0)")
            )
        ).alias("s2"),
    )
    j = (
        r.join(stats, "host")
        .withColumn("x", F.col("length").cast("double"))
        .withColumn("nd", F.col("n_host").cast("double"))
        .withColumn("s1d", F.col("s1").cast("double"))
        .withColumn("s2d", F.col("s2").cast("double"))
    )
    return j.filter(F.expr(ANOMALY_PRED_EXPR)).select(
        "host",
        "doc_id",
        "length",
        F.col("n_host").cast("long").alias("n_host"),
        F.expr(MEAN_FLOOR_EXPR).alias("mean_len"),
    )


def length_anomaly_sql(rows_cte: str) -> str:
    """DuckDB twin of :func:`length_anomaly`. ``rows_cte`` must select
    (host, doc_id, length)."""
    return f"""
with r as (
  select host, doc_id::BIGINT as doc_id, length::BIGINT as length
  from ({rows_cte})
),
stats as (
  select host, count(*) as n_host,
         sum(length::DECIMAL(38,0)) as s1,
         sum(length::DECIMAL(19,0) * length::DECIMAL(19,0)) as s2
  from r group by host
),
j as (
  select r.host, r.doc_id, r.length, stats.n_host,
         r.length::DOUBLE as x, stats.n_host::DOUBLE as nd,
         stats.s1::DOUBLE as s1d, stats.s2::DOUBLE as s2d
  from r join stats using (host)
)
select host, doc_id, length, n_host::BIGINT as n_host,
       {MEAN_FLOOR_EXPR} as mean_len
from j
where {ANOMALY_PRED_EXPR}
"""
