"""Sinks — the reference's output surfaces, Spark-idiomatic.

* ``upsert_parquet``  — S12: the SQL sink's per-row ``session.merge``
  (/root/reference/database/database.py:49-61,93-186) becomes one atomic
  set-level MERGE: new rows replace existing rows with the same key, the
  rest survive. Backed by plain parquet + the same tmp-then-rename commit
  the snapshot store uses (an Iceberg ``MERGE INTO`` drops in unchanged on
  a real catalog).
* ``write_nested_json`` — S10: the crawler's golden JSON dump
  (/root/reference/crawler.py:288-292). Stays driver-side ``json.dump`` for
  byte-stable goldens (small by construction); the distributed path for big
  outputs is ``df.write.json``.
* ``assign_venue_ids`` — J3: deterministic dense id allocation for new
  venue keys (/root/reference/crawler.py:46-53 allocates "next free int" by
  linear probing; resumes must keep ids stable, README.md:105-107). New keys
  get ``max(existing id) + row_number() over (order by key)`` — replayable
  at any parallelism, no ``monotonically_increasing_id``.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def upsert_parquet(
    spark: SparkSession, updates: DataFrame, path: str, key_cols: list[str]
) -> None:
    """Idempotent set-level upsert: MERGE-by-key semantics on a parquet dir.

    Survivors = existing rows whose key is NOT in updates (left_anti), plus
    all update rows. The rewrite commits via write-to-tmp then rename, so a
    reader never sees a HALF-WRITTEN table and re-running the same upsert is
    a no-op (the reference's resume guarantee).

    Concurrency contract (single-writer, like the reference's one FIFO
    writer thread, database.py:45-61): the commit is two renames
    (path->old, tmp->path), so between them a concurrent reader finds NO
    table at ``path``, and concurrent upserts have no mutual exclusion —
    this sink assumes exactly one writer and retry-on-missing readers. On a
    real deployment the same call maps to an Iceberg ``MERGE INTO`` whose
    snapshot commit removes both gaps (the SnapshotStore pattern:
    versioned directory + atomically replaced pointer).
    """
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        survivors = existing.join(
            updates.select(*key_cols).distinct(), key_cols, "left_anti"
        )
        merged = survivors.unionByName(updates)
    else:
        merged = updates
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        old = f"{path}.old-{uuid.uuid4().hex[:8]}"
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(tmp, path)


def write_nested_json(obj, path: str, indent: int | None = 2) -> None:
    """Golden-output JSON sink — byte-stable driver-side dump (S10)."""
    tmp = f"{path}.tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(obj, f, indent=indent, ensure_ascii=False)
    os.replace(tmp, path)


def assign_venue_ids(existing: DataFrame, keys: DataFrame) -> DataFrame:
    """J3 — stable-id dim upsert: (venue, year) keys keep their existing id;
    new keys get consecutive ids after the current max, ordered by key.

    ``existing``: (venue_id, venue, year); ``keys``: (venue, year).
    Returns (venue_id, venue, year) covering every input key. Deterministic
    and replayable: same inputs -> same ids at any parallelism. ``keys`` is
    deduplicated here — the stable-id contract is per DISTINCT key, and a
    caller passing duplicate (venue, year) rows must not mint one id each
    (ADVICE r1).
    """
    keys = keys.select("venue", "year").distinct()
    known = keys.join(existing, ["venue", "year"], "inner").select(
        "venue_id", "venue", "year"
    )
    new_keys = keys.join(existing.select("venue", "year"), ["venue", "year"], "left_anti")
    max_id = (existing.agg(F.coalesce(F.max("venue_id"), F.lit(0)).alias("m")))
    w = Window.orderBy("venue", "year")
    allocated = (
        new_keys.crossJoin(F.broadcast(max_id))
        .withColumn("venue_id", (F.col("m") + F.row_number().over(w)).cast("int"))
        .select("venue_id", "venue", "year")
    )
    return known.unionByName(allocated)
