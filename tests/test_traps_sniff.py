"""r4b operators: crawl-trap detection and MIME magic-byte sniffing.

Semantic checks against hand-computed verdicts on the planted URL shapes,
plus plan-shape guards: both operators must stay pure projections (no
exchange, no Python row UDF) so they ride the frontier/page scan at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openreviewcrawler_spark.catalog import (
    MAGIC_PREFIX_EXPR,
    TRAP_URL_EXPR,
    q_crawl_trap_detect,
    q_mime_sniff,
)
from openreviewcrawler_spark.operators.multimodal import sniff_mime
from openreviewcrawler_spark.operators.traps import classify_traps


def test_trap_verdict_per_planted_shape(spark, sf_dir):
    out = q_crawl_trap_detect(spark, sf_dir)
    by_case = {
        r["c"]: r
        for r in out.withColumn("c", (F.col("doc_id") % 6).cast("int"))
        .select("c", "n_dup_segments", "n_params", "n_date_segments", "verdict")
        .distinct()
        .collect()
    }
    assert by_case[0]["verdict"] == "ok"  # /a/b/<id>
    assert by_case[1]["verdict"] == "suspect"  # segment loop only
    assert by_case[1]["n_dup_segments"] >= 2
    assert by_case[2]["verdict"] == "trap"  # calendar + its own repeats
    assert by_case[2]["n_date_segments"] >= 2
    assert by_case[3]["verdict"] == "suspect"  # query explosion only
    assert by_case[3]["n_params"] >= 6
    assert by_case[4]["verdict"] == "trap"  # deep repeat: dup + depth
    assert by_case[5]["verdict"] == "ok"


def test_trap_classify_is_scan_side_projection(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.expr(TRAP_URL_EXPR).alias("url")
    )
    plan = classify_traps(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_mime_sniff_matches_magic(spark, sf_dir):
    out = q_mime_sniff(spark, sf_dir)
    by_case = {
        r["c"]: r["mime"]
        for r in out.withColumn("c", (F.col("doc_id") % 7).cast("int"))
        .select("c", "mime")
        .distinct()
        .collect()
    }
    assert by_case[0] == "application/pdf"
    assert by_case[1] == "image/gif"
    assert by_case[2] == "audio/x-wav"
    assert by_case[3] == "audio/ogg"
    assert by_case[4] == "text/html"
    assert by_case[5] == "application/xml"
    assert by_case[6] == "text/plain"


def test_mime_sniff_operates_on_binary_and_stays_codegen(spark, sf_dir):
    pages = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.encode(F.expr(f"{MAGIC_PREFIX_EXPR} || text"), "utf-8").alias("payload"),
    )
    out = sniff_mime(pages)
    assert dict(out.dtypes)["payload"] == "binary"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    # n_bytes counts BYTES of the blob, not characters of the source text
    row = out.select(
        "n_bytes", F.length("payload").cast("long").alias("blob_len")
    ).first()
    assert row["n_bytes"] == row["blob_len"]
