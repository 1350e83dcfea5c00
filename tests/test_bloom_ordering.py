"""Property tests: Bloom (no false negatives, merge commutativity) and the
scalable sequence assigner (== global window row_number)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from openreviewcrawler_spark.operators.ordering import (
    assign_seq_global_window,
    assign_seq_scalable,
)
from openreviewcrawler_spark.operators.seen import BloomFilter, build_bloom


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(42)
    keys = rng.integers(-(2**31), 2**31, size=20_000, dtype=np.int64)
    flt = BloomFilter.sized_for(len(keys), fpp=0.01)
    flt.add_many(keys)
    assert flt.might_contain_many(keys).all()  # never a false negative

    probe = rng.integers(-(2**31), 2**31, size=20_000, dtype=np.int64)
    novel = probe[~np.isin(probe, keys)]
    fp_rate = flt.might_contain_many(novel).mean()
    assert fp_rate < 0.03, fp_rate


def test_bloom_merge_commutative_associative():
    rng = np.random.default_rng(7)
    parts = [rng.integers(0, 2**40, size=500, dtype=np.int64) for _ in range(4)]

    def built(order):
        f = BloomFilter(1 << 14, 5)
        for i in order:
            g = BloomFilter(1 << 14, 5)
            g.add_many(parts[i])
            f.union_bytes(g.to_bytes())
        return f.to_bytes()

    assert built([0, 1, 2, 3]) == built([3, 1, 0, 2]) == built([2, 3, 1, 0])


def test_build_bloom_treeaggregate(spark):
    df = spark.range(0, 5000).select(F.hash(F.col("id").cast("string")).alias("h"))
    df = df.repartition(8)
    flt = BloomFilter.sized_for(5000, 0.01)
    merged = build_bloom(df, "h", flt.n_bits, flt.k)
    from openreviewcrawler_spark.hashing import murmur3_str

    keys = np.array([murmur3_str(str(i)) for i in range(5000)], dtype=np.int64)
    assert merged.might_contain_many(keys).all()


def test_scalable_seq_equals_window(spark):
    df = spark.createDataFrame(
        [(i % 7, (i * 37) % 101, f"u{i:05d}") for i in range(3000)],
        "seed_index int, depth int, url string",
    ).repartition(16)
    cols = ["seed_index", "depth", "url"]
    a = {
        r["url"]: r["s"]
        for r in assign_seq_scalable(df, cols, "s", offset=10).collect()
    }
    b = {
        r["url"]: r["s"]
        for r in assign_seq_global_window(df, cols, "s", offset=10).collect()
    }
    assert a == b
    assert sorted(a.values()) == list(range(10, 3010))

def test_bucketed_seq_equals_window(spark):
    from openreviewcrawler_spark.operators.ordering import assign_seq_bucketed

    df = spark.createDataFrame(
        [((i * 13) % 97, (i * 37) % 3, f"u{i:05d}") for i in range(3000)],
        "seed_index int, depth int, url string",
    ).repartition(16)
    cols = ["seed_index", "depth", "url"]
    a = {
        r["url"]: r["s"]
        for r in assign_seq_bucketed(
            df, cols, "s", offset=10, lead_bounds=(0, 96), num_buckets=16
        ).collect()
    }
    b = {
        r["url"]: r["s"]
        for r in assign_seq_global_window(df, cols, "s", offset=10).collect()
    }
    assert a == b
    assert sorted(a.values()) == list(range(10, 3010))


def test_bucketed_seq_no_extra_jobs(spark):
    """The bucketed stamp must add ZERO driver barriers: building and
    collecting the stamped output is one action with no preparatory jobs
    (the scalable impl runs a sampling job + a counts job at call time)."""
    from openreviewcrawler_spark.operators.ordering import assign_seq_bucketed

    df = spark.createDataFrame(
        [(i % 50, i % 3, f"u{i:05d}") for i in range(2000)],
        "seed_index int, depth int, url string",
    )
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    out = assign_seq_bucketed(df, ["seed_index", "depth", "url"], "s", lead_bounds=(0, 49))
    mid = len(tracker.getJobIdsForGroup(None) or [])
    assert mid == before, "plan construction must not launch jobs"
    out.collect()


def test_scalable_seq_survives_union_fused_consumer(spark):
    """Regression: the stamp's partition offsets must come from cached DATA,
    not TaskContext.partitionId(). When the stamped plan's FIRST
    materialization happens inside a union-fused stage, task partition ids
    are shifted by the other branch's partition count; reading them at stamp
    time mis-numbers every partition (KeyError at best, silently wrong
    fetch_seq at worst). The production shape that hits this is
    ``stamped.unionByName(denied)`` in the crawl round."""
    df = spark.createDataFrame(
        [(i % 7, i % 3, f"u{i:05d}") for i in range(3000)],
        "seed_index int, depth int, url string",
    ).repartition(16)
    cols = ["seed_index", "depth", "url"]
    ref = assign_seq_global_window(df, cols, "s", offset=0)
    stamped = assign_seq_scalable(df, cols, "s", offset=0)  # NOT materialized yet
    u = ref.select("url", "s").unionByName(stamped.select("url", "s"))
    mismatches = (
        u.groupBy("url", "s").count().filter(F.col("count") != 2).count()
    )
    assert mismatches == 0
