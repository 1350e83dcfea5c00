"""Approximate-nearest-neighbor search over an embedding column.

Not present in the reference (it has no vector data); required for the
training-data-pipeline surface. Three tiers, all pure array expressions
(JVM-side, codegen'd — no Python in the scoring loop):

  * ``brute_topk``   — exact cosine top-k: broadcast the (small) query set
                       against the full corpus, score, per-query window.
                       The baseline and the recall oracle.
  * ``ivf_topk``     — IVF-style: candidates are restricted to the query's
                       coarse cell, so the join is an equi-join on cell id
                       and the scan prunes to matching cells. At 100 TB the
                       cell id comes from a trained coarse quantizer; here
                       the precomputed ``label`` column plays that role
                       (same plan shape, deterministic).
  * ``lsh_signatures`` — random-hyperplane cosine LSH: sign(v . r_j) bits,
                       hyperplane components derived from md5 so Spark and
                       DuckDB generate identical planes. Bucketing on the
                       signature turns ANN into an equi-join, the 10^10-row
                       scale path.

All floats are summed in identical left-fold order in both engines and
rounded before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import hash32_col

N_PLANES = 8


def _as_double(vectors: DataFrame) -> DataFrame:
    return vectors.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("e"),
    ).withColumn(
        "norm",
        F.sqrt(F.aggregate(F.col("e"), F.lit(0.0), lambda a, x: a + x * x)),
    )


def _cos(l_e: str, r_e: str, l_norm: str, r_norm: str):
    dot = F.aggregate(
        F.zip_with(F.col(l_e), F.col(r_e), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return dot / (F.col(l_norm) * F.col(r_norm))


def brute_topk(vectors: DataFrame, n_queries: int = 16, k: int = 5) -> DataFrame:
    """(query_id, cand_id, rank, cos) — exact top-k by cosine.

    Query side is tiny -> broadcast; the corpus side streams. Rank ties are
    broken by cand_id so output is deterministic.
    """
    v = _as_double(vectors)
    q = v.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("norm").alias("qnorm"),
    )
    scored = v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        _cos("qe", "e", "qnorm", "norm").alias("cos_raw"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", F.col("rank").cast("long").alias("rank"),
                F.round(F.col("cos_raw"), 3).alias("cos"))
    )


def ivf_topk(vectors: DataFrame, n_queries: int = 16, k: int = 3) -> DataFrame:
    """(query_id, cand_id, rank, cos) — top-k within the query's coarse cell.

    The equi-join on cell bounds work to |cell| candidates per query; with a
    real quantizer this is the IVF probe=1 plan. Cell id = ``label``.
    """
    v = _as_double(vectors)
    q = v.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qcell"),
        F.col("e").alias("qe"),
        F.col("norm").alias("qnorm"),
    )
    scored = v.join(
        F.broadcast(q),
        (F.col("label") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        _cos("qe", "e", "qnorm", "norm").alias("cos_raw"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", F.col("rank").cast("long").alias("rank"),
                F.round(F.col("cos_raw"), 3).alias("cos"))
    )


def lsh_signatures(vectors: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """(vec_id, sig) — random-hyperplane signature, bit j = [v . r_j > 0].

    Plane component r_j[i] is a deterministic pseudo-random value in
    [-1, 1): (hash32('p{j}|{i}') % 2000) / 1000 - 1 — reproducible in SQL,
    stable across runs/engines (no ``rand()``; the engine bans
    nondeterminism, SURVEY.md §4)."""
    v = vectors.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))

    def plane_dot(j: int):
        return F.aggregate(
            F.zip_with(
                F.col("e"),
                F.sequence(F.lit(1), F.size(F.col("e"))),
                lambda x, i: x
                * (
                    (hash32_col(F.concat(F.lit(f"p{j}|"), i.cast("string"))) % 2000)
                    / F.lit(1000.0)
                    - F.lit(1.0)
                ),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )

    sig = None
    for j in range(n_planes):
        bit = F.when(plane_dot(j) > 0, F.lit(1).cast("long")).otherwise(F.lit(0))
        term = bit * F.lit(1 << j).cast("long")
        sig = term if sig is None else sig + term
    return v.select("vec_id", sig.alias("sig"))
