"""Sinks: idempotent parquet upsert (S12 MERGE analog), stable venue-id
allocation (J3), golden JSON sink (S10)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from openreviewcrawler_spark.sources.sinks import (
    assign_venue_ids,
    upsert_parquet,
    write_nested_json,
)


def test_upsert_parquet_merge_semantics(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    upsert_parquet(spark, base, path, ["id"])
    upd = spark.createDataFrame([(2, "B"), (4, "d")], "id long, v string")
    upsert_parquet(spark, upd, path, ["id"])
    got = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}
    # idempotent: same upsert again changes nothing
    upsert_parquet(spark, upd, path, ["id"])
    again = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert again == got


def test_assign_venue_ids_stable_and_dense(spark):
    existing = spark.createDataFrame(
        [(1, "ICLR.cc", 2019), (2, "NeurIPS.cc", 2019)],
        "venue_id int, venue string, year int",
    )
    keys = spark.createDataFrame(
        [("ICLR.cc", 2019), ("ICLR.cc", 2020), ("ACL.org", 2020)],
        "venue string, year int",
    )
    out = {(r["venue"], r["year"]): r["venue_id"] for r in assign_venue_ids(existing, keys).collect()}
    assert out[("ICLR.cc", 2019)] == 1          # existing id kept (README.md:107)
    assert out[("ACL.org", 2020)] == 3          # new ids: max+1 in key order
    assert out[("ICLR.cc", 2020)] == 4
    # replay determinism
    out2 = {(r["venue"], r["year"]): r["venue_id"] for r in assign_venue_ids(existing, keys).collect()}
    assert out == out2


def test_write_nested_json_golden(tmp_path):
    p = str(tmp_path / "out.json")
    obj = [{"venue": "X", "year": 2020, "submissions": [{"id": "n1"}]}]
    write_nested_json(obj, p)
    with open(p, encoding="utf-8") as f:
        assert json.load(f) == obj
    write_nested_json(obj, p)  # overwrite path exercises os.replace
    assert os.path.exists(p)
