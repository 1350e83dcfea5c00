"""Deterministic global ordering — the engine's replacement for everything the
reference gets from single-threaded loop order (/root/reference/crawler.py:41-45,
72-73: config order -> year -> invitation -> note order).

``fetch_seq`` must be identical at local[8] and local[32] (north rule), so all
sequence numbers derive from explicit priority keys, never from partition or
task order. ``monotonically_increasing_id`` / ``rand`` / wall-clock are banned.

Two implementations of one contract:

* ``assign_seq_global_window`` — ``row_number()`` over an unpartitioned window.
  Exact, but funnels through one task: only safe for small batches.
* ``assign_seq_scalable`` — the zipWithIndex pattern: range-repartition on the
  (globally unique) order key, sort within partitions, count per partition,
  broadcast prefix offsets, then stamp ``offset + local_index`` in an Arrow
  ``mapInPandas``. Partition *boundaries* may vary run to run; the assigned
  sequence depends only on the total order of the unique key, so the output is
  deterministic at any parallelism.
* ``assign_seq_bucketed`` — zero extra driver barriers: when the LEADING order
  column is integral with known bounds (the crawl plan observes min/max
  seed_index for free in its single counts action), bucket rows by an
  order-aligned monotone function of that column, ``row_number()`` within each
  bucket, and add per-bucket prefix offsets computed by a tiny window over the
  per-bucket counts (a broadcast-joined P-row table). Everything stays in one
  job inside whole-stage codegen — no range-sampling job, no per-partition
  count job, no Python worker round-trip. Same stamped values as the other two
  impls (rank in the total order of ``order_cols``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def assign_seq_global_window(
    df: DataFrame, order_cols: list[str], seq_col: str = "fetch_seq", offset: int = 0
) -> DataFrame:
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(seq_col, F.row_number().over(w) + F.lit(offset - 1).cast("long"))


def assign_seq_scalable(
    df: DataFrame,
    order_cols: list[str],
    seq_col: str = "fetch_seq",
    offset: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Stamp a global 0..N-1 (+offset) sequence in total-order of ``order_cols``.

    ``order_cols`` must form a globally unique key (ours ends in the canonical
    url, which is unique per batch). Triggers one counting job; the
    repartitioned input is cached so both passes see identical partitions.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    d = df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
    d = d.sortWithinPartitions(*order_cols)
    # The partition id is CACHED AS DATA, not read from TaskContext at stamp
    # time. TaskContext.partitionId() is the task's index within its physical
    # STAGE — when the stamped output is consumed inside a stage that fuses a
    # union (e.g. ``stamped.unionByName(other)`` before first
    # materialization), every id is shifted by the other branch's partition
    # count, silently mis-stamping (or KeyError-ing) the sequence. A data
    # column evaluated once at cache materialization is immune: the counts
    # job below is the first action, runs the plan standalone (ids 0..P-1 in
    # range order), and every later consumer reads the frozen value.
    d = d.withColumn("__pid", F.spark_partition_id())
    # tracked: the returned DataFrame still references this cache, so the
    # handle must outlive the call — callers release between queries via
    # caching.release_persisted (the r4 ADVICE leak class)
    from ..caching import track_persist

    d = track_persist(d, StorageLevel.MEMORY_AND_DISK)

    counts = d.groupBy("__pid").count().collect()
    sizes = {r["__pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = offset
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    b_offsets = spark.sparkContext.broadcast(offsets)

    out_schema = T.StructType(list(df.schema.fields) + [T.StructField(seq_col, T.LongType())])

    def _stamp(batches):
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = b_offsets.value[int(pdf["__pid"].iloc[0])]
            pdf = pdf.drop(columns=["__pid"])
            pdf[seq_col] = np.arange(base, base + len(pdf), dtype=np.int64)
            base += len(pdf)
            yield pdf

    return d.mapInPandas(_stamp, out_schema)


def assign_seq_bucketed(
    df: DataFrame,
    order_cols: list[str],
    seq_col: str = "fetch_seq",
    offset: int = 0,
    lead_bounds: tuple[int, int] | None = None,
    num_buckets: int | None = None,
) -> DataFrame:
    """Stamp the same global sequence as :func:`assign_seq_scalable`, with no
    extra jobs and no Python.

    Requires ``order_cols[0]`` integral with ``lead_bounds = (min, max)``
    known (exact bounds are free if the caller already runs an aggregation —
    the crawl plan observes them in its counts action). The bucket id is a
    monotone non-decreasing function of the leading column, so
    ``(bucket, *order_cols)`` order == ``order_cols`` order, and
    ``prefix_offset[bucket] + row_number within bucket`` is exactly the rank
    in the total order. The per-bucket count table is P rows: its
    unbounded-preceding window and broadcast join are negligible.

    Skew note: rows sharing one leading value land in one bucket, so this
    impl is only selected when the leading column's span covers the bucket
    count (``assign_fetch_seq`` falls back to the range-partition impl
    otherwise)."""
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    lo, hi = lead_bounds
    span = int(hi) - int(lo) + 1
    lead = F.col(order_cols[0]).cast("long")
    bucket = F.floor(((lead - F.lit(int(lo))) * F.lit(num_buckets)) / F.lit(span)).cast("int")
    ranked = df.withColumn("__bkt", bucket).withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("__bkt").orderBy(*[F.col(c) for c in order_cols])
        ),
    )
    counts = (
        df.select(bucket.alias("__bkt"))
        .groupBy("__bkt")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    w_off = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        "__bkt",
        (F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)) + F.lit(offset)).alias("__off"),
    )
    return (
        ranked.join(F.broadcast(offs), "__bkt")
        .withColumn(seq_col, (F.col("__off") + F.col("__rn") - 1).cast("long"))
        .drop("__bkt", "__rn", "__off")
        .select(*df.columns, seq_col)
    )


def assign_fetch_seq(
    df: DataFrame,
    order_cols: list[str],
    seq_col: str = "fetch_seq",
    offset: int = 0,
    small_threshold: int | None = None,
    known_count: int | None = None,
    lead_bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """Pick the window impl for small batches; for large ones the barrier-free
    bucketed impl when the leading key's bounds are known and wide enough to
    balance, else the range-partition impl."""
    if small_threshold is not None and known_count is not None and known_count <= small_threshold:
        return assign_seq_global_window(df, order_cols, seq_col, offset)
    if lead_bounds is not None:
        lo, hi = lead_bounds
        num_buckets = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        if int(hi) - int(lo) + 1 >= num_buckets:
            return assign_seq_bucketed(
                df, order_cols, seq_col, offset, (int(lo), int(hi)), num_buckets
            )
    return assign_seq_scalable(df, order_cols, seq_col, offset)
