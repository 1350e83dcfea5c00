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


def interleave_datasets(
    docs: DataFrame,
    weights: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted interleave of sources into one global order —
    the distributed analog of ``interleave_datasets`` in dataloader stacks.

    Sources repeat block-cyclically: one block of W = Σ w_s slots holds
    w_s consecutive slots per source (sources in name order), so the k-th
    document of source s (docs ordered by id within source) lands at

        slot = (k div w_s) * W  +  block_offset_s  +  (k mod w_s)

    Pure integer arithmetic; slots are unique by construction and a source
    that exhausts simply leaves its later block positions empty (``slot``
    is a PRIORITY key the loader sorts by, not a dense index — gaps are
    fine and keep the formula stateless).

    Scale shape: the per-source rank k comes from ONE global scalable
    stamp over (source, id) minus each source's broadcast start offset
    (min(seq) per source — a tiny agg), NOT from a per-source window: at
    web scale a corpus has few, huge sources, so ``Window.partitionBy
    (source)`` would funnel each source through one task. The weight/offset
    dimension is O(sources) and computed with a window over that tiny
    table only.
    """
    from pyspark.sql import Window

    from .ordering import assign_seq_scalable

    stamped = assign_seq_scalable(
        docs.select(F.col(source_col).alias("source"), F.col(id_col)),
        ["source", id_col],
        seq_col="__seq",
    )
    starts = stamped.groupBy("source").agg(F.min("__seq").alias("__start"))

    # O(sources) dimension: block offsets via a window over the tiny table
    # (explicitly NOT the corpus — see docstring)
    w_dim = weights.select(F.col(source_col).alias("source"), F.col("weight"))
    wspec = Window.orderBy("source").rowsBetween(Window.unboundedPreceding, -1)
    wspec_all = Window.orderBy("source").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # block_w via a full-frame window over the SAME tiny table — not a
    # single-row crossJoin, which would plan as BroadcastNestedLoopJoin
    dim = w_dim.withColumn(
        "block_offset", F.coalesce(F.sum("weight").over(wspec), F.lit(0))
    ).withColumn("block_w", F.sum("weight").over(wspec_all))

    out = (
        stamped.join(F.broadcast(starts), "source")
        .join(F.broadcast(dim), "source")
        .select(
            id_col,
            "source",
            (F.col("__seq") - F.col("__start")).cast("long").alias("k"),
            F.col("weight").cast("long").alias("weight"),
            F.col("block_offset").cast("long").alias("block_offset"),
            F.col("block_w").cast("long").alias("block_w"),
        )
    )
    # integral `div` (long / long is DOUBLE in Spark — inexact past 2^53)
    return out.select(
        id_col,
        "source",
        "k",
        "weight",
        F.expr("(k div weight) * block_w + block_offset + (k % weight)")
        .cast("long")
        .alias("slot"),
    )
