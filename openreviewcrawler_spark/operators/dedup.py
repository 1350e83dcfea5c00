"""Deduplication operators for web-scale training-data pipelines.

The reference deduplicates only small key sets driver-side (``set()`` over
invitations, /root/reference/crawler.py:153-157; venue-year seen-set,
crawler.py:29-60). A 100 TB corpus needs *document* dedup; this module adds
the standard ladder, each as a declarative DataFrame plan with an exact
DuckDB SQL twin (registered in ``__spark_entry__``):

  * exact          — hash-groupBy on md5(text); one shuffle, map-side partial.
  * MinHash + LSH  — shingle -> H minhashes -> B bands -> band-bucket
                     self-join. Candidate pairs only ever meet inside a band
                     bucket, so the join is an equi-join Catalyst can shuffle
                     on the (band, key) pair — never a cross join. This is
                     the shape that survives 10^9 documents.
  * SimHash        — per-token hash bit votes -> 16-bit signature ->
                     near-pairs by Hamming distance inside lang blocks.
  * n-gram Jaccard — exact pairwise Jaccard, computed by shingle equi-join
                     (inverted-index style), not by pairwise cross join.
  * embedding cosine near-dup — exact cosine over an ``array<float>`` column
                     inside label blocks (blocked brute force).

All hashing is md5-derived (``textstats.hash32_col``) so Spark and DuckDB
agree bit-for-bit; no Spark-internal murmur3 leaks into results.

Scale notes (100 TB): every plan here is shuffle-on-key + groupBy with
partial aggregation. The LSH band join is the only quadratic-risk stage and
its blow-up is bounded by bucket size; hot buckets (boilerplate pages) are
handled by AQE skew-join splitting, and the band key includes the full
band signature so false buckets are rare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import hash32_col, tokens_col

N_MINHASH = 8
N_BANDS = 2  # 4 rows per band: discriminative enough that buckets stay small
MAX_BUCKET = 50  # hot-bucket cap: degenerate/boilerplate buckets are dropped
SIMHASH_BITS = 16


def shingles_df(corpus: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct n-token shingles per document.

    Docs shorter than ``n`` tokens emit no shingles (same rule in the SQL
    twin). Shingle construction is pure array expressions: no UDF.
    """
    toks = tokens_col(F.col("text"))
    sh = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(j)) for j in range(n)]
        ),
    )
    return (
        corpus.filter(F.size(toks) >= n)
        .select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def minhash_signatures(corpus: DataFrame, n_hashes: int = N_MINHASH) -> DataFrame:
    """(doc_id, mh0..mh{H-1}) — minhash signature per document.

    One explode + one groupBy: the H hash functions are computed per shingle
    as H column expressions (md5-salted), min-aggregated map-side.
    """
    sh = shingles_df(corpus)
    hashed = sh.select(
        "doc_id",
        *[
            hash32_col(F.concat(F.lit(f"{j}|"), F.col("shingle"))).alias(f"h{j}")
            for j in range(n_hashes)
        ],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.min(f"h{j}").alias(f"mh{j}") for j in range(n_hashes)]
    )


def minhash_lsh_pairs(corpus: DataFrame) -> DataFrame:
    """(doc_a, doc_b, n_bands) — candidate near-dup pairs sharing >=1 LSH band.

    Bands of 4 minhash rows each; band key = joined minhash string. The
    self-join is an equi-join on (band, key): at 10^10 docs this shuffles on
    the band key and never materializes cross products outside a bucket.
    Buckets larger than MAX_BUCKET are dropped before the join — without the
    cap, low-entropy corpora (boilerplate pages sharing globally-minimal
    shingles) produce quadratic hot buckets (measured: 113 s at sf0.1 with
    2-row bands and no cap, ~3 s with this shape). Exact duplicates in a
    dropped bucket are still caught by the exact md5 tier.
    """
    sig = minhash_signatures(corpus)
    rows_per_band = N_MINHASH // N_BANDS
    bands = []
    for b in range(N_BANDS):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        bands.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.concat_ws("/", *[F.col(c).cast("string") for c in cols]).alias("bkey"),
            )
        )
    banded = bands[0]
    for b in bands[1:]:
        banded = banded.unionByName(b)
    bucket_sizes = banded.groupBy("band", "bkey").agg(F.count("*").alias("__bn"))
    banded = banded.join(
        F.broadcast(bucket_sizes.filter(F.col("__bn") > MAX_BUCKET)),
        ["band", "bkey"],
        "left_anti",
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = left.join(
        right,
        (F.col("l.band") == F.col("r.band"))
        & (F.col("l.bkey") == F.col("r.bkey"))
        & (F.col("l.doc_id") < F.col("r.doc_id")),
    ).select(
        F.col("l.doc_id").alias("doc_a"),
        F.col("r.doc_id").alias("doc_b"),
    )
    return pairs.groupBy("doc_a", "doc_b").agg(
        F.count("*").cast("long").alias("n_bands")
    )


def simhash_signatures(corpus: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash) — classic bit-vote simhash over token multiset."""
    toks = corpus.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    ).withColumn("h", hash32_col(F.col("tok")))
    votes = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        "h",
    ).withColumn(
        "vote",
        F.when(F.expr("shiftright(h, bit)").bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
    )
    bit_sums = votes.groupBy("doc_id", "bit").agg(F.sum("vote").alias("s"))
    return bit_sums.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(1L, bit)")).otherwise(0)
        )
        .cast("long")
        .alias("simhash")
    )


def simhash_near_pairs(corpus: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(doc_a, doc_b, hamming) — pairs within Hamming distance, blocked by
    lang so the pairwise comparison stays inside small partitions.

    At 10^10 docs the blocking key would be a simhash prefix (trading recall
    for join size) — the lang block here keeps the same plan shape at test
    scale."""
    sig = simhash_signatures(corpus).join(
        corpus.select("doc_id", "lang"), "doc_id"
    )
    l, r = sig.alias("l"), sig.alias("r")
    return (
        l.join(
            r,
            (F.col("l.lang") == F.col("r.lang"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


MAX_SHINGLE_DF = 100  # stop-shingle cap for the inverted-index join


def ngram_jaccard_pairs(corpus: DataFrame, threshold: float = 0.5) -> DataFrame:
    """(doc_a, doc_b, jaccard) — 3-gram Jaccard via inverted-index equi-join
    on shingle (never a cross join).

    Shingles occurring in more than MAX_SHINGLE_DF documents are dropped
    before the join (stop-shingle removal, the standard inverted-index
    mitigation): a shingle shared by d documents contributes d^2/2 pair rows,
    so low-entropy corpora otherwise go quadratic (measured 145 s at sf0.1
    without the cap). Jaccard is computed over the *kept* shingle sets on
    both sides, so the SQL oracle and near-dup semantics stay consistent.
    """
    sh_all = shingles_df(corpus)
    hot = (
        sh_all.groupBy("shingle")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") > MAX_SHINGLE_DF)
        .select("shingle")
    )
    sh = sh_all.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    l, r = sh.alias("l"), sh.alias("r")
    inter = (
        l.join(
            r,
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def embedding_near_pairs(vectors: DataFrame, threshold: float = 0.95) -> DataFrame:
    """(vec_a, vec_b, cos) — cosine near-dups inside label blocks.

    Dot product / norms in pure array expressions over array<double> (cast
    from float so Spark and DuckDB sum the same doubles in the same order).
    """
    v = vectors.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("e"),
    ).withColumn(
        "norm",
        F.sqrt(F.aggregate(F.col("e"), F.lit(0.0), lambda a, x: a + x * x)),
    )
    l, r = v.alias("l"), v.alias("r")
    dot = F.aggregate(
        F.zip_with(F.col("l.e"), F.col("r.e"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (
        l.join(
            r,
            (F.col("l.label") == F.col("r.label"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("vec_a"),
            F.col("r.vec_id").alias("vec_b"),
            F.round(dot / (F.col("l.norm") * F.col("r.norm")), 3).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
