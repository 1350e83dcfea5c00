"""Source/domain mixing weights — temperature-scaled corpus composition.

Multi-source pretraining corpora are not sampled proportionally to raw
source size: low-resource sources are UP-weighted by a temperature
``w_s ∝ n_s^(1/τ)`` (mT5/XLM-R style; DoReMi learns the weights, this is
the closed-form baseline). The distributed shape is one tiny aggregation
over the corpus (per-source counts), one single-row total, and a per-row
projection — no per-doc shuffle at all, so it costs one map-side-partial
groupBy at any corpus size.

Float parity: τ is fixed at 2 so the power is ``sqrt``, which IEEE-754
requires to be correctly rounded — bit-identical across Spark and DuckDB
(unlike ``pow``/``ln``, measured r4). The normalizing sum is decimal-cast
per the repo float-parity recipe.

Reference analog: the reference crawls venue-by-venue with per-venue
request budgets (crawler.py main loop); this is the corpus-level
generalization: how many documents each source contributes to a fixed
training budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def domain_mix(docs: DataFrame, budget: int, source_col: str = "source") -> DataFrame:
    """(source, n_docs, weight, target_docs) — temperature-τ=2 sampling
    weights and the per-source document allocation of ``budget``.

    weight_s = sqrt(n_s) / Σ sqrt(n_s)  (rounded 6dp for display);
    target_docs = floor(weight_s * budget) on the UNrounded weight.
    """
    counts = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").alias("n_docs")
    )
    total = counts.agg(
        F.sum(F.sqrt(F.col("n_docs")).cast("decimal(28,12)"))
        .cast("double")
        .alias("__z")
    )
    w = F.sqrt(F.col("n_docs")) / F.col("__z")
    return (
        counts.crossJoin(F.broadcast(total))  # single-row normalizer
        .select(
            "source",
            "n_docs",
            F.round(w, 6).alias("weight"),
            F.floor(w * F.lit(float(budget))).cast("long").alias("target_docs"),
        )
    )
