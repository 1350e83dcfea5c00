"""Corpus bigram language-model fluency scoring (CCNet-style quality stage).

CCNet ranks documents by the perplexity of a small LM trained on a trusted
corpus and keeps the head/middle buckets; the distributed shape of that
stage is (1) train token-transition statistics over the corpus with
aggregations, (2) score every document against the trained table with joins,
(3) bucket per language. This module implements that shape with a bigram
maximum-likelihood model trained on the corpus itself.

Reference analog: the reference scores/filters notes with per-document
predicates (statistics_from_json.py aggregate family); this is the
train-data generalization the 100 TB pipeline needs.

Float-parity note (why the score is in PROBABILITY domain, not log domain):
``ln`` is not correctly-rounded and Spark's JVM ``Math.log`` disagrees with
DuckDB's libm in the last ulp on ~7 % of inputs (measured r4: 5 729 of
79 800 rational inputs differ bitwise), so a negative-log-likelihood sum can
never be bit-identical across engines. IEEE-754 *division* IS correctly
rounded, so per-bigram probabilities p = c2/c1 are bit-identical; the
per-document mean is made order-independent with the repo's decimal-sum
recipe. The score is therefore ``mean_p`` — the mean transition probability
— which is a monotone fluency signal (tests assert it orders documents the
same way as true NLL on planted data).

Scale shape (10^10 docs): bigram emission is the slice-zip pattern (no
lambda-captured re-inlining); the transition tables are two cascaded
aggregations with map-side partials; scoring is two shuffle equi-joins on
(bigram) and (head token) — NO broadcast of corpus-derived aggregates (the
vocabulary of a web corpus does not fit a driver) — and one final groupBy
per doc. The bigram relation is persisted so train + score read one
evaluation of the tokenizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..caching import track_persist


def bigrams_df(corpus: DataFrame) -> DataFrame:
    """(doc_id, lang, w1, bigram) — one row per token TRANSITION (multiplicity
    kept, unlike dedup.shingles_df which is distinct-per-doc). Docs with
    fewer than 2 tokens emit nothing. Slice-zip shape: lambdas touch only
    their own arguments (CLAUDE.md re-inlining trap)."""
    toks = F.split(F.col("text"), " ")
    m = F.size(toks) - F.lit(1)
    pairs = F.zip_with(
        F.slice(toks, 1, m), F.slice(toks, 2, m), lambda a, b: F.concat_ws(" ", a, b)
    )
    return (
        corpus.filter(F.size(toks) >= 2)
        .select("doc_id", "lang", F.explode(pairs).alias("bigram"))
        .select(
            "doc_id",
            "lang",
            F.substring_index("bigram", " ", 1).alias("w1"),
            "bigram",
        )
    )


def transition_tables(bigrams: DataFrame) -> tuple[DataFrame, DataFrame]:
    """MLE tables: c2 = count per (w1, bigram); c1 = count per head token.
    c1 is derived FROM c2 (cascaded agg on already-reduced data) so the
    corpus is scanned once for both."""
    c2 = bigrams.groupBy("w1", "bigram").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    return c2, c1


def fluency_scores(corpus: DataFrame, n_buckets: int = 3) -> DataFrame:
    """(doc_id, lang, n_bigrams, mean_p, bucket) — mean MLE transition
    probability per document plus the CCNet head/middle/tail bucket
    (semantics of ``ntile`` per language over descending fluency, doc_id
    tiebreak; the SQL oracle states it as a literal ntile).

    mean_p = double(sum(decimal(28,12)(c2/c1)))/n, rounded to 6 — exact and
    order-independent per the repo float-parity recipe.

    Scale shape of the bucketing: a per-LANGUAGE window is a funnel — one
    dominant language (most of a web corpus) lands every row in one task.
    Instead the per-language rank rides the same scalable ordering stamp as
    ``fetch_seq`` (``ordering.assign_seq_scalable``: range-repartition +
    per-partition counts + Arrow stamp), ordered by (lang, -mean_p, doc_id);
    per-language ranks subtract the language's global offset (one tiny
    broadcast — languages are fixed cardinality, ~hundreds at web scale) and
    the bucket is closed-form ntile arithmetic on (rank, lang_count).
    Negation of a rounded double is IEEE-exact, so the sort key is still
    bit-deterministic."""
    bg = track_persist(bigrams_df(corpus))
    c2, c1 = transition_tables(bg)
    scored = (
        bg.join(c2, ["w1", "bigram"])
        .join(c1, "w1")
        .select(
            "doc_id",
            "lang",
            (F.col("c2").cast("double") / F.col("c1").cast("double")).alias("p"),
        )
    )
    per_doc = scored.groupBy("doc_id", "lang").agg(
        F.count("*").alias("n_bigrams"),
        F.round(
            F.sum(F.col("p").cast("decimal(28,12)")).cast("double") / F.count("*"),
            6,
        ).alias("mean_p"),
    )
    from .ordering import assign_seq_scalable

    ranked = assign_seq_scalable(
        per_doc.withColumn("__negp", -F.col("mean_p")),
        ["lang", "__negp", "doc_id"],
        seq_col="__seq",
    )
    # per-language sizes/offsets from the ALREADY-persisted ranked input
    # (assign_seq_scalable pins its repartitioned table, so this aggregate
    # is a cache read, not a second evaluation of the scoring joins)
    lang_sizes = ranked.groupBy("lang").agg(
        F.count("*").alias("__n"), F.min("__seq").alias("__off")
    )
    r = F.col("__seq") - F.col("__off") + F.lit(1)  # 1-based rank in lang
    k = F.lit(n_buckets)
    q = (F.col("__n") - F.col("__n") % k) / k  # floor(n/k), exact int-in-double
    rem = F.col("__n") % k
    head = rem * (q + 1)  # rows covered by the (q+1)-sized leading buckets
    bucket = (
        F.when(r <= head, F.floor((r - 1) / (q + 1)) + 1)
        .otherwise(rem + F.floor((r - 1 - head) / q) + 1)
        .cast("int")
    )
    return (
        ranked.join(F.broadcast(lang_sizes), "lang")
        .withColumn("bucket", bucket)
        .select("doc_id", "lang", "n_bigrams", "mean_p", "bucket")
    )
