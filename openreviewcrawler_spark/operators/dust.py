"""DUST rule mining — find URL query parameters that never change content.

Reference analog: the crawler canonicalizes invitation/URL spellings before
dedup (/root/reference/crawler.py:41-45 builds its visit keys from normalized
ids); at web scale the same idea becomes *rule mining*: different URLs with
the same text ("DUST", Bar-Yossef et al., WWW'07) are detected by checking,
per (host, query-parameter), whether varying that parameter ever changes the
fetched content fingerprint. Parameters that never do (session ids, tracking
tags) are safe to strip in canonicalization, collapsing the frontier before
the seen filter even runs.

Semantics (exact, engine-independent):
  * a URL's query splits on '&' into ``k=v`` params (empty query = no rows);
  * for each param p of a URL, its *residual* is the URL with p removed and
    the remaining params sorted — the controlled experiment key;
  * a (host, param_key, residual) group with >= 2 distinct values of the
    param is a *tested* group; it is *irrelevant* if all its fingerprints
    are equal;
  * a (host, param_key) with >= ``min_groups`` tested groups, all of them
    irrelevant, gets rule 'strip'; otherwise 'keep'.

Scale shape: explode fan-out bounded by params-per-URL, then TWO map-side-
combined groupBys ((host,key,residual) then (host,key)) — no joins, no
windows, no driver collects; the output is O(hosts x param keys), tiny.
Removing-all-equal-elements semantics (``filter(x -> x != p)``) is shared
with the oracle, so duplicate identical params behave identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mine_dust_rules(pages: DataFrame, min_groups: int = 2) -> DataFrame:
    """pages: (url, fingerprint) -> (host, param_key, n_groups, n_irrelevant, rule).

    ``n_groups`` counts tested residual groups; param keys that never get a
    tested group simply emit no row (there is no evidence either way).
    """
    parsed = pages.select(
        "fingerprint",
        F.regexp_extract("url", "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1).alias("host"),
        F.regexp_extract("url", "^([^?#]*)", 1).alias("base"),
        F.regexp_extract("url", "[?]([^#]*)", 1).alias("query"),
    )
    with_params = parsed.withColumn(
        "params", F.expr("filter(split(query, '&'), x -> x != '')")
    )
    # one row per (url, param); the lambda references only row attributes
    # (`p` is a plain column, not a derived expression — the per-element
    # re-inline trap in CLAUDE.md does not bite on attribute references)
    exploded = with_params.select(
        "fingerprint",
        "host",
        "base",
        "params",
        F.explode("params").alias("p"),
    ).select(
        "fingerprint",
        "host",
        F.regexp_extract("p", "^([^=]*)", 1).alias("param_key"),
        F.regexp_extract("p", "=(.*)$", 1).alias("param_value"),
        F.concat(
            F.col("base"),
            F.lit("?"),
            F.array_join(F.array_sort(F.expr("filter(params, x -> x != p)")), "&"),
        ).alias("residual"),
    )
    groups = exploded.groupBy("host", "param_key", "residual").agg(
        F.countDistinct("param_value").alias("n_values"),
        F.countDistinct("fingerprint").alias("n_fps"),
    )
    tested = groups.filter(F.col("n_values") >= 2)
    rules = tested.groupBy("host", "param_key").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("n_fps") == 1).cast("long")).alias("n_irrelevant"),
    )
    return rules.select(
        "host",
        "param_key",
        "n_groups",
        "n_irrelevant",
        F.when(
            (F.col("n_groups") >= min_groups)
            & (F.col("n_irrelevant") == F.col("n_groups")),
            F.lit("strip"),
        )
        .otherwise(F.lit("keep"))
        .alias("rule"),
    )
