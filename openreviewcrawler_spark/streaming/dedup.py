"""Streaming URL dedup — drop re-discovered URLs inside a watermark horizon.

The batch seen tier (operators/seen, cuckoo) deduplicates against the FULL
crawl history; the streaming ingest side has the complementary problem:
the same URL surfaces many times within minutes (hub pages re-linked from
every crawled neighbor), and each re-discovery should be dropped at the
stream edge before it costs a history probe at all. That is exactly
``dropDuplicatesWithinWatermark``: state is bounded by (discoveries inside
the watermark horizon), late events beyond the horizon are dropped by the
watermark itself, and the full-history tier downstream catches anything
that re-appears after the horizon.

Two-tier contract (mirrors the production crawler shape):
  stream edge   — this module: in-horizon duplicate collapse, O(horizon)
                  state, exactly-once per micro-batch;
  history tier  — ``operators/seen`` / cuckoo: exact membership against
                  everything ever crawled, probed only for the survivors.

Determinism note: which PHYSICAL row survives within a duplicate group is
micro-batch-timing dependent — but every output column we keep is a pure
function of the canonical url, so the OUTPUT is deterministic even though
the survivor row identity is not (the test pins this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import canonicalize_col, host_col


def dedup_discoveries(
    discoveries: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming DataFrame (raw_url, discovered_ts) -> unique canonical urls.

    Canonicalizes first (two raw spellings of one target must collapse to
    ONE state entry), keys the duplicate state on the canonical url alone,
    and keeps (url, host) — columns derived from the key, so the output set
    is independent of which arrival wins the state race.
    """
    canon = discoveries.select(
        canonicalize_col(F.col("raw_url")).alias("url"),
        F.col("discovered_ts"),
    ).withColumn("host", host_col(F.col("url")))
    return (
        canon.withWatermark("discovered_ts", watermark)
        .dropDuplicatesWithinWatermark(["url"])
        # discovered_ts stays OUT of the output: the surviving row's
        # timestamp depends on arrival order inside the micro-batch, and
        # the contract above promises an order-independent output set
        .select("url", "host")
    )
