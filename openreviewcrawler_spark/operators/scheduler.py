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
