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
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark import StorageLevel, TaskContext
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
    d = d.persist(StorageLevel.MEMORY_AND_DISK)

    counts = (
        d.select(F.spark_partition_id().alias("__pid"))
        .groupBy("__pid")
        .count()
        .collect()
    )
    sizes = {r["__pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = offset
    for pid in range(num_partitions):
        offsets[pid] = acc
        acc += sizes.get(pid, 0)
    b_offsets = spark.sparkContext.broadcast(offsets)

    out_schema = T.StructType(list(df.schema.fields) + [T.StructField(seq_col, T.LongType())])

    def _stamp(batches):
        ctx = TaskContext.get()
        base = b_offsets.value[ctx.partitionId()]
        for pdf in batches:
            pdf = pdf.copy()
            pdf[seq_col] = np.arange(base, base + len(pdf), dtype=np.int64)
            base += len(pdf)
            yield pdf

    return d.mapInPandas(_stamp, out_schema)


def assign_fetch_seq(
    df: DataFrame,
    order_cols: list[str],
    seq_col: str = "fetch_seq",
    offset: int = 0,
    small_threshold: int | None = None,
    known_count: int | None = None,
) -> DataFrame:
    """Pick the window impl for small batches, the scalable one otherwise."""
    if small_threshold is not None and known_count is not None and known_count <= small_threshold:
        return assign_seq_global_window(df, order_cols, seq_col, offset)
    return assign_seq_scalable(df, order_cols, seq_col, offset)
