"""Hashed-n-gram quality classifier (DSIR-style importance scoring with
integer weights).

Data-selection pipelines (Xie et al. 2023, DSIR; the CCNet/fastText quality
filters) score every document by how target-domain-like its n-gram
distribution is. The published formulation sums LOG likelihood ratios —
banned here: ``ln`` is not bit-identical between the JVM and DuckDB's libm
(CLAUDE.md r4 lesson). This module keeps the whole model in INTEGERS:

* every token hashes into one of ``N_BUCKETS`` buckets (the repo-standard
  md5 hash32, the only cross-engine hash);
* a bucket's weight is the scaled share of its occurrences that come from
  target-domain documents: ``w = (n_target * W_SCALE) div n_total`` —
  integer division, exact on both engines;
* a document's score is the integer sum of its tokens' bucket weights
  (with multiplicity); the only float is one per-row division for the
  mean weight (bit-stable).

Scale shape: the weight table has AT MOST ``N_BUCKETS`` rows — bounded by
the model geometry, not the corpus — so it is broadcast-able by
construction and scores attach to a 10^10-doc corpus with a map-side join
plus one per-doc groupBy. Training the weights is one groupBy over hashed
tokens with map-side partial sums. The reference has no quality model at
all (it keeps every fetched note, /root/reference/crawler.py parse pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import hash32_col, tokens_col

N_BUCKETS = 1024
W_SCALE = 10000


def _bucket_col(token: Column) -> Column:
    return F.pmod(hash32_col(token), F.lit(N_BUCKETS)).cast("int")


def hashgram_weights(docs: DataFrame, target_col: str) -> DataFrame:
    """Train the weight table ``(bucket, w)`` in one pass: explode tokens,
    bucket them, and take the scaled target share per bucket. ``target_col``
    is a boolean column marking target-domain documents."""
    tok = docs.select(
        F.col(target_col).cast("long").alias("is_t"),
        F.explode(tokens_col(F.col("text"))).alias("token"),
    )
    b = tok.select(_bucket_col(F.col("token")).alias("bucket"), "is_t")
    return (
        b.groupBy("bucket")
        .agg(
            (F.sum("is_t") * F.lit(W_SCALE)).alias("tw"),
            F.count("*").alias("n"),
        )
        .select("bucket", F.expr("tw div n").cast("long").alias("w"))
    )


def hashgram_scores(docs: DataFrame, weights: DataFrame) -> DataFrame:
    """(doc_id, n_toks, score, mean_w) — integer score per document plus the
    per-token mean weight (0..W_SCALE; higher = more target-like). The
    weights relation is broadcast: its size is bounded by N_BUCKETS."""
    tok = docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("token"))
    b = tok.select("doc_id", _bucket_col(F.col("token")).alias("bucket"))
    scored = (
        b.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_toks"),
            F.sum("w").cast("long").alias("score"),
        )
    )
    return scored.select(
        "doc_id",
        "n_toks",
        "score",
        F.round(
            F.col("score").cast("double") / F.col("n_toks").cast("double"), 6
        ).alias("mean_w"),
    )
