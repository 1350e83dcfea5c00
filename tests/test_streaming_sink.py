"""Streaming upsert sink (streaming/sink.py): latest-wins merge
semantics, exactly-once across availableNow runs sharing a checkpoint,
idempotent batch replay after a simulated pre-commit crash."""

from __future__ import annotations

import os
import tempfile

import pytest

from openreviewcrawler_spark.sources.checkpoint import SnapshotStore
from openreviewcrawler_spark.streaming.sink import (
    merge_upsert,
    run_upsert_sink,
    upsert_batch_fn,
)

SCHEMA = "url string, status long, fetched_ms long"


@pytest.fixture()
def dirs():
    base = tempfile.mkdtemp(prefix="orc_ssink_")
    src, store, ckpt = (os.path.join(base, d) for d in ("src", "store", "ckpt"))
    os.makedirs(src)
    return src, store, ckpt


def _append(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _drain(spark, src, store, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = run_upsert_sink(
        stream, store, "fetched", ["url"], "fetched_ms", ckpt
    )
    assert q.awaitTermination(120), "availableNow run did not finish"


def _state(spark, store):
    df = store.read(spark, "fetched")
    return {} if df is None else {
        r["url"]: (r["status"], r["fetched_ms"]) for r in df.collect()
    }


def test_upsert_latest_wins_and_exactly_once(spark, dirs):
    src, root, ckpt = dirs
    store = SnapshotStore(root)

    # phase 1: two urls, one of them captured twice in the same batch —
    # within-batch latest-wins keeps the later capture
    _append(spark, src, [("u1", 200, 10), ("u1", 503, 5), ("u2", 200, 7)])
    _drain(spark, src, store, ckpt)
    assert _state(spark, store) == {"u1": (200, 10), "u2": (200, 7)}

    # phase 2: a recrawl updates u1 and discovers u3 — u1's row is
    # REPLACED (no duplicate key), u2 is untouched
    _append(spark, src, [("u1", 304, 20), ("u3", 404, 21)])
    _drain(spark, src, store, ckpt)
    assert _state(spark, store) == {
        "u1": (304, 20),
        "u2": (200, 7),
        "u3": (404, 21),
    }

    # phase 3: drain again with no new files — nothing changes, and the
    # store's high-water mark prevents any rewrite
    mark_before = store.extra()["stream_batch:fetched"]
    _drain(spark, src, store, ckpt)
    assert _state(spark, store) == {
        "u1": (304, 20),
        "u2": (200, 7),
        "u3": (404, 21),
    }
    assert store.extra()["stream_batch:fetched"] == mark_before


def test_replayed_batch_id_is_a_noop(spark, dirs):
    src, root, ckpt = dirs
    store = SnapshotStore(root)
    fn = upsert_batch_fn(store, "fetched", ["url"], "fetched_ms")

    b0 = spark.createDataFrame([("u1", 200, 1)], SCHEMA)
    fn(b0, 0)
    assert _state(spark, store) == {"u1": (200, 1)}

    # crash-replay of batch 0 with DIFFERENT (stale) content must be
    # ignored: the manifest already carries batch 0
    stale = spark.createDataFrame([("u1", 500, 99)], SCHEMA)
    fn(stale, 0)
    assert _state(spark, store) == {"u1": (200, 1)}

    # the next batch id applies normally
    fn(stale, 1)
    assert _state(spark, store) == {"u1": (500, 99)}


def test_merge_upsert_pure_batch_semantics(spark):
    existing = spark.createDataFrame(
        [("a", 1, 1), ("b", 1, 1)], SCHEMA
    )
    batch = spark.createDataFrame(
        [("b", 2, 5), ("b", 3, 9), ("c", 1, 2)], SCHEMA
    )
    out = {
        r["url"]: (r["status"], r["fetched_ms"])
        for r in merge_upsert(existing, batch, ["url"], "fetched_ms").collect()
    }
    assert out == {"a": (1, 1), "b": (3, 9), "c": (1, 2)}
