"""Streaming sessionization (streaming/sessionize.sessionize_stream):
session_window merge semantics, watermark-driven close, exactly-once emit
across sequential availableNow runs sharing a checkpoint. Event-time-only
phases — no sleeps, no wall-clock timers (the r3 ProcessingTimeTimeout
lesson)."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pytest

from openreviewcrawler_spark.streaming.sessionize import sessionize_stream

SCHEMA = "user_id long, ts timestamp"


@pytest.fixture()
def dirs():
    base = tempfile.mkdtemp(prefix="orc_ssess_")
    src, out, ckpt = (os.path.join(base, d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)
    return src, out, ckpt


def _append(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _run_once(spark, src, out, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow run did not finish"


def _sessions(spark, out):
    return sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    )


def test_session_window_merges_and_closes_on_watermark(spark, dirs):
    src, out, ckpt = dirs
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    # phase 1: user 1 has two events 10 min apart (one session), user 2 one
    # event. Watermark hasn't passed any session end -> nothing emits.
    _append(spark, src, [
        (1, t0),
        (1, t0 + dt.timedelta(minutes=10)),
        (2, t0 + dt.timedelta(minutes=5)),
    ])
    _run_once(spark, src, out, ckpt)
    assert _sessions(spark, out) == []

    # phase 2: a far-future event advances the watermark past every
    # phase-1 session end -> both sessions close and emit exactly once.
    _append(spark, src, [(3, t0 + dt.timedelta(hours=6))])
    _run_once(spark, src, out, ckpt)
    got = _sessions(spark, out)
    assert len(got) == 2
    (u1, s1, e1, n1), (u2, s2, e2, n2) = got
    # user 1: one MERGED session [t0, t0+10min+gap), 2 events
    assert (u1, n1) == (1, 2)
    assert s1 == t0
    assert e1 == t0 + dt.timedelta(minutes=40)  # last event + 30-min gap
    # user 2: singleton session, end = event + gap
    assert (u2, n2) == (2, 1)
    assert s2 == t0 + dt.timedelta(minutes=5)
    assert e2 == t0 + dt.timedelta(minutes=35)

    # phase 3: rerun with no new data — nothing re-emits (exactly-once),
    # and the user-3 session stays open (watermark hasn't passed it).
    _run_once(spark, src, out, ckpt)
    assert _sessions(spark, out) == got


def test_gap_split_creates_two_sessions(spark, dirs):
    src, out, ckpt = dirs
    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)
    _append(spark, src, [
        (7, t0),
        (7, t0 + dt.timedelta(minutes=31)),  # > 30-min gap -> new session
    ])
    _run_once(spark, src, out, ckpt)
    _append(spark, src, [(8, t0 + dt.timedelta(hours=6))])
    _run_once(spark, src, out, ckpt)
    got = [(u, n) for u, _s, _e, n in _sessions(spark, out)]
    assert got == [(7, 1), (7, 1)]
