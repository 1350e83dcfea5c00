"""dedup family query builders + DuckDB oracles (mechanically split from the catalog monolith)."""

from __future__ import annotations
from collections.abc import Callable
from dataclasses import dataclass
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..functions.urls import canonicalize_col, host_col
from ..operators import dedup, multimodal, similarity
from ..operators.labeling import label_row
from ..operators.comment_tree import reply_forest
from ..operators.ordering import assign_seq_scalable
from ..operators.robots import apply_robots
from ..operators.scheduler import admit
from ..operators.seen import anti_join_seen
from ..operators.stats import (
    attach_notes_with_misses,
    count_histogram,
    note_type_col,
    orphan_metrics,
)
from ..operators.textstats import (
    fingerprint_cols,
    lang_id_col,
    quality_score_cols,
    token_count_cols,
)
from ..plans.crawl import seeds_to_frontier
from ._shared import (
    CORPUS_SQL,
    SQL_DEDUP_COMPONENTS,
    _DEG_BUCKET_CASE,
    _H32,
    _SQL_DOT,
    _SQL_NORM,
    _SQL_SHINGLES,
    _SQL_TOKENS,
    _corpus,
    _sql_banded_cte,
    _sql_lsh_bands_cte,
    _sql_simhash_wide,
    _sw_sql,
    _t,
)


VECSET_SQL = """
  select vec_id, embedding, label from embeddings
  union all
  select vec_id + 100000 as vec_id, embedding, label from embeddings where vec_id % 10 = 0
"""


def _vecset(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    dups = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    return emb.unionByName(dups)


# ---------------------------------------------------------------------------
# training-data pipeline: dedup family (over the derived corpus with
# constructed exact + near duplicates)
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    return (
        corpus.groupBy(F.md5("text").alias("text_md5"))
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


SQL_DEDUP_EXACT = f"""
with corpus as ({CORPUS_SQL})
select md5(text) as text_md5, min(doc_id)::BIGINT as keeper_id,
       count(*)::BIGINT as n_copies
from corpus group by 1 having count(*) > 1
"""


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(_corpus(spark, sf_dir))


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup scan (operators/dedup.minhash_lsh_incremental):
    the production shape — today's batch (the derived +100000/+200000 dup
    docs) probes the already-deduplicated history (the original documents)
    via a strict new-vs-old band equi-join; history x history never
    re-runs."""
    corpus = _corpus(spark, sf_dir)
    old = corpus.filter(F.col("doc_id") < 100000)
    new = corpus.filter(F.col("doc_id") >= 100000)
    return dedup.minhash_lsh_incremental(old, new)


def _sql_minhash_incremental() -> str:
    return f"""
{_sql_banded_cte()},
old_b as (select * from banded_all where doc_id < 100000),
new_b as (select * from banded_all where doc_id >= 100000),
hot as (
  select band, bkey from old_b group by band, bkey
  having count(*) > {dedup.MAX_BUCKET}
),
old_kept as (
  select b.* from old_b b
  where not exists (select 1 from hot h where h.band = b.band and h.bkey = b.bkey)
)
select n.doc_id::BIGINT as new_id, o.doc_id::BIGINT as old_id,
       count(*)::BIGINT as n_bands
from new_b n join old_kept o on n.band = o.band and n.bkey = o.bkey
group by 1, 2
"""


SQL_DEDUP_INCREMENTAL = _sql_minhash_incremental()


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_near_pairs(_corpus(spark, sf_dir))


def _sql_simhash() -> str:
    ham = " + ".join(
        f"bit_count(xor(wl.b{b}, wr.b{b}))" for b in range(dedup.SIMHASH_BANDS)
    )
    band_rows = " union all ".join(
        f"select doc_id, {b}::BIGINT as band, b{b} as bval from wide"
        for b in range(dedup.SIMHASH_BANDS)
    )
    return f"""{_sql_simhash_wide()}, bands as (
  {band_rows}
), hot as (
  select band, bval from bands group by 1, 2 having count(*) > {dedup.MAX_BUCKET}
), kept as (
  select b.* from bands b
  where not exists (select 1 from hot h where h.band = b.band and h.bval = b.bval)
), pairs as (
  select distinct l.doc_id as doc_a, r.doc_id as doc_b
  from kept l join kept r
    on l.band = r.band and l.bval = r.bval and l.doc_id < r.doc_id
)
select p.doc_a::BIGINT as doc_a, p.doc_b::BIGINT as doc_b, ({ham})::BIGINT as hamming
from pairs p
join wide wl on p.doc_a = wl.doc_id
join wide wr on p.doc_b = wr.doc_id
where ({ham}) <= {dedup.SIMHASH_MAX_HAMMING}
"""


SQL_DEDUP_SIMHASH = _sql_simhash()


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(_corpus(spark, sf_dir))


SQL_DEDUP_NGRAM_JACCARD = f"""
with corpus as ({CORPUS_SQL}), {_SQL_SHINGLES},
hot as (
  select shingle from sh group by shingle having count(*) > {dedup.MAX_SHINGLE_DF}
),
kept as (
  select s.* from sh s where not exists (select 1 from hot h where h.shingle = s.shingle)
),
sizes as (select doc_id, count(*) as n_sh from kept group by 1),
inter as (
  select l.doc_id as doc_a, r.doc_id as doc_b, count(*) as i
  from kept l join kept r on l.shingle = r.shingle and l.doc_id < r.doc_id
  group by 1, 2
)
select doc_a::BIGINT as doc_a, doc_b::BIGINT as doc_b,
       round(i / (sa.n_sh + sb.n_sh - i)::DOUBLE, 4) as jaccard
from inter join sizes sa on inter.doc_a = sa.doc_id
join sizes sb on inter.doc_b = sb.doc_id
where round(i / (sa.n_sh + sb.n_sh - i)::DOUBLE, 4) >= 0.5
"""


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.embedding_near_pairs(_vecset(spark, sf_dir))


SQL_DEDUP_EMBEDDING_COSINE = f"""
with vecset as ({VECSET_SQL}),
v as (
  select vec_id, embedding::DOUBLE[] as e,
         {_SQL_NORM.format(a='embedding::DOUBLE[]')} as nrm
  from vecset
),
{_sql_lsh_bands_cte('v')},
hot as (
  select band, bval from bands group by 1, 2
  having count(*) > {similarity.MAX_VEC_BUCKET}
),
kept as (
  select b.* from bands b
  where not exists (select 1 from hot h where h.band = b.band and h.bval = b.bval)
),
pairs as (
  select distinct l.vec_id as vec_a, r.vec_id as vec_b
  from kept l join kept r
    on l.band = r.band and l.bval = r.bval and l.vec_id < r.vec_id
)
select p.vec_a::BIGINT as vec_a, p.vec_b::BIGINT as vec_b,
       round({_SQL_DOT.format(a='vl.e', b='vr.e')} / (vl.nrm * vr.nrm), 3) as cos
from pairs p join v vl on p.vec_a = vl.vec_id join v vr on p.vec_b = vr.vec_id
where round({_SQL_DOT.format(a='vl.e', b='vr.e')} / (vl.nrm * vr.nrm), 3) >= 0.95
"""


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: MinHash-LSH pairs -> connected components -> every
    corpus doc labeled with its canonical keeper (min reachable doc_id).
    A~B and B~C collapse to one keeper even when A~C was never emitted —
    the decision a 100 TB dedup actually has to make per document."""
    corpus = _corpus(spark, sf_dir)
    edges = dedup.minhash_lsh_pairs(corpus).select("doc_a", "doc_b")
    comp = dedup.connected_components(edges, corpus.select("doc_id"))
    return comp.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
    )


def q_dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size profile — the dedup QA report a 100 TB pass
    publishes per shard: for each cluster size, how many near-dup clusters
    exist, how many documents they cover, and how many rows dedup removes
    (size−1 per cluster, the keeper stays). Singleton "clusters" (docs with
    no near-dup) are reported too: their count is the survivor baseline.

    Scale shape: the expensive part is the components labeling the pipeline
    already computes; the profile itself is two map-side-partial groupBys
    over (doc_id, component) — no joins, no windows, output rows bounded by
    the largest cluster size."""
    corpus = _corpus(spark, sf_dir)
    edges = dedup.minhash_lsh_pairs(corpus).select("doc_a", "doc_b")
    comp = dedup.connected_components(edges, corpus.select("doc_id"))
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.col("n_clusters").cast("long").alias("n_clusters"),
            (F.col("cluster_size") * F.col("n_clusters")).cast("long").alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters"))
            .cast("long")
            .alias("n_removed"),
        )
    )


SQL_DEDUP_CLUSTER_STATS = f"""
with comp as ({SQL_DEDUP_COMPONENTS}),
sizes as (select component, count(*) as cluster_size from comp group by 1)
select cluster_size::BIGINT as cluster_size,
       count(*)::BIGINT as n_clusters,
       (cluster_size * count(*))::BIGINT as n_docs,
       ((cluster_size - 1) * count(*))::BIGINT as n_removed
from sizes
group by cluster_size
"""


# ---------------------------------------------------------------------------
# r4 operators: paragraph dedup, bigram-LM fluency, domain mixing,
# byte-budget politeness
# ---------------------------------------------------------------------------


def q_dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MassiveText-style paragraph dedup over the duplicate-planted corpus:
    global first-occurrence keep per paragraph hash, documents reassembled
    from surviving paragraphs (operators/dedup.paragraph_dedup). The planted
    exact-duplicate docs (+200000) lose every paragraph and drop out."""
    return dedup.paragraph_dedup(_corpus(spark, sf_dir)).select(
        "doc_id",
        F.col("n_chunks").cast("long").alias("n_chunks"),
        F.col("n_kept").cast("long").alias("n_kept"),
        "clean_text",
    )


SQL_DEDUP_PARAGRAPH = f"""
with corpus as ({CORPUS_SQL}),
chunked as (
  select doc_id, regexp_extract_all(text, '{dedup.PARA_CHUNK_RE}') as cs from corpus
),
chunks as (
  select doc_id, unnest(cs) as chunk,
         unnest(range(0, len(cs))) as chunk_idx
  from chunked
),
hashed as (
  select doc_id, chunk_idx, chunk, {_H32.format(x="chunk")} as h from chunks
),
kept as (
  select doc_id, chunk_idx, chunk from (
    select *, row_number() over (partition by h order by doc_id, chunk_idx) as rn
    from hashed
  ) where rn = 1
),
totals as (select doc_id, count(*)::BIGINT as n_chunks from hashed group by doc_id)
select k.doc_id, t.n_chunks, count(*)::BIGINT as n_kept,
       array_to_string(list(k.chunk order by k.chunk_idx), ' ') as clean_text
from kept k join totals t using (doc_id)
group by k.doc_id, t.n_chunks
"""


def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication statistics (operators/dedup.
    substring_dup_stats): per-document share of 8-token windows occurring
    elsewhere in the corpus — the Lee-et-al signal that document-level
    dedup misses. Windows hash to 64-bit before any shuffle; frequency is
    one map-side-partial groupBy (boilerplate on 10^9 pages = one row)."""
    return dedup.substring_dup_stats(_corpus(spark, sf_dir))


def _sql_dedup_substring() -> str:
    k = dedup.SUBSTR_K
    window = " || ' ' || ".join(f"toks[i + {j}]" for j in range(k))
    return f"""
with corpus as ({CORPUS_SQL}),
t as (select doc_id, {_SQL_TOKENS} as toks from corpus
      where len({_SQL_TOKENS}) >= {k}),
w as (select doc_id, unnest(list_distinct(
        list_transform(range(1, len(toks) - {k - 2}), i -> {window})
      )) as shingle from t),
hw as (select doc_id, {_H32.format(x='shingle')} as h from w),
f as (select h, count(*) as nd from hw group by h)
select hw.doc_id,
       count(*)::BIGINT as n_windows,
       sum(case when f.nd >= 2 then 1 else 0 end)::BIGINT as n_dup,
       round(sum(case when f.nd >= 2 then 1 else 0 end)::DOUBLE
             / count(*)::DOUBLE, 6) as dup_fraction
from hw join f using (h)
group by hw.doc_id
"""


# --- minhash sketch-accuracy QA (r4d) ---------------------------------------


def q_dedup_minhash_error_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy QA (operators/dedup.minhash_error_profile):
    |estimated − true| Jaccard over the LSH candidate pairs in 0.05-wide
    error bins — the per-corpus calibration behind any dedup threshold.
    Signatures computed once (persisted, shared with the band table); every
    join is candidate-bounded."""
    from ..operators.dedup import minhash_error_profile

    return minhash_error_profile(_corpus(spark, sf_dir))


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (operators/similarity.semantic_dedup):
    k-means cells, then within-cell cosine >= 0.99 marks the higher id a
    duplicate — lowest id survives, the same keeper rule as the whole
    dedup family. Runs over the _vecset synthesis (planted exact
    duplicates at vec_id % 10 == 0 + 100000), so kept=false rows are
    guaranteed non-trivial."""
    return similarity.semantic_dedup(_vecset(spark, sf_dir))


SQL_DEDUP_SEMANTIC = f"""
with vecset as ({VECSET_SQL}),
v as (
  select vec_id, embedding::DOUBLE[] as e,
         {_SQL_NORM.format(a='embedding::DOUBLE[]')} as nrm
  from vecset
), cents0 as (
  select row_number() over (order by vec_id) - 1 as cell, e as ce, nrm as cnrm
  from (select * from v order by vec_id limit {similarity.IVF_K})
), assign0 as (
  select vec_id, cell from (
    select v.vec_id, c.cell,
      row_number() over (partition by v.vec_id order by
        {_SQL_DOT.format(a='c.ce', b='v.e')} / (c.cnrm * v.nrm) desc, c.cell asc) as r
    from v cross join cents0 c
  ) where r = 1
), dim as (
  select a.cell, unnest(range(1, len(v.e) + 1)) as i, unnest(v.e) as val
  from assign0 a join v on a.vec_id = v.vec_id
), means as (
  select cell, i, sum(val::DECIMAL(28,12))::DOUBLE / count(*) as m
  from dim group by 1, 2
), cents as (
  select cell, ce, {_SQL_NORM.format(a='ce')} as cnrm from (
    select cell, list(m order by i) as ce from means group by cell
  )
), assign as (
  select vec_id, cell from (
    select v.vec_id, c.cell,
      row_number() over (partition by v.vec_id order by
        {_SQL_DOT.format(a='c.ce', b='v.e')} / (c.cnrm * v.nrm) desc, c.cell asc) as r
    from v cross join cents c
  ) where r = 1
), sv as (
  select a.vec_id, a.cell, v.e, v.nrm
  from assign a join v using (vec_id)
), dup as (
  select distinct a.vec_id
  from sv a join sv b using (cell)
  where b.vec_id < a.vec_id
    and {_SQL_DOT.format(a='a.e', b='b.e')} / (a.nrm * b.nrm)
        >= {similarity.SEMDEDUP_THRESHOLD}::DOUBLE
)
select s.vec_id, s.cell::BIGINT as cell, (d.vec_id is null) as kept
from sv s left join dup d using (vec_id)
"""


def q_dedup_keeper_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup keeper selection — for every near-dup cluster
    (>= 2 members), which member a QUALITY-argmax policy keeps vs the
    canonical min-doc_id keeper, and the quality gained by choosing it.
    The curation upgrade on top of dedup_components: min-id keeps
    whichever copy crawled first; a real pipeline keeps the best copy
    (the un-truncated original over the tail-cut near-dup).

    Scale shape: the expensive part is the components labeling the
    pipeline already computes; on top of it, one size groupBy, one q10
    attach join, one row_number window PER COMPONENT over cluster
    members only (the edge subgraph — orders of magnitude smaller than
    the corpus), and the min-id baseline's quality attaches by joining
    q10 on component directly (component == min reachable doc_id by
    construction). Quality is compared in integer TENTHS (textstats.
    quality_q10_col) — no float-sum ordering artifacts."""
    from ..operators.textstats import quality_q10_col

    corpus = _corpus(spark, sf_dir)
    edges = dedup.minhash_lsh_pairs(corpus).select("doc_a", "doc_b")
    comp = dedup.connected_components(edges, corpus.select("doc_id"))
    q = corpus.select("doc_id", quality_q10_col(F.col("text")).alias("q10"))
    return dedup.quality_keeper(comp, q)


SQL_DEDUP_KEEPER_QUALITY = f"""
with comp as ({SQL_DEDUP_COMPONENTS}),
corpus as ({CORPUS_SQL}),
qb as (
  select doc_id, len({_SQL_TOKENS})::BIGINT as n_tokens,
         length(text)::BIGINT as n_chars,
         {_sw_sql(("the", "a", "of", "and", "is", "to"))}::BIGINT as stop_en,
         length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g'))::BIGINT as nop
  from corpus
),
q as (
  select doc_id,
         (case when n_tokens between 10 and 100000 then 4 else 0 end
          + case when (n_chars - (n_tokens - 1)) / n_tokens::DOUBLE >= 2.0
                  and (n_chars - (n_tokens - 1)) / n_tokens::DOUBLE <= 12.0
                 then 3 else 0 end
          + case when stop_en / n_tokens::DOUBLE >= 0.01 then 2 else 0 end
          + case when (n_chars - nop) / n_chars::DOUBLE <= 0.2
                 then 1 else 0 end)::BIGINT as q10
  from qb
),
sizes as (
  select component, count(*)::BIGINT as cluster_size
  from comp group by 1 having count(*) >= 2
),
r as (
  select c.component, s.cluster_size, c.doc_id, q.q10,
         row_number() over (partition by c.component
                            order by q.q10 desc, c.doc_id asc) as rq
  from comp c join sizes s using (component) join q on q.doc_id = c.doc_id
)
select r.component, r.cluster_size, r.doc_id as keeper_doc,
       r.q10 as keeper_q10, mq.q10 as minid_q10,
       (r.q10 - mq.q10)::BIGINT as q_gain
from r join q mq on mq.doc_id = r.component
where r.rq = 1
"""


def q_dedup_threshold_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-sensitivity audit for embedding near-dup removal: ONE
    banded candidate-pair pass scored at cos >= 0.90, rolled up into the
    pair counts a 0.90 / 0.95 / 0.99 cutoff would each remove plus the
    distinct vectors touched at the production 0.95 cutoff — the
    elbow-curve row that justifies (or indicts) the chosen threshold
    before a 10^10-doc dedup run commits to it. Reuses
    dedup.embedding_near_pairs (hyperplane-LSH bands, hot-bucket cap,
    exact-cosine verify); thresholds compare on the shared round(cos, 3)
    projection, so the buckets are engine-identical. Single-row output."""
    pairs = dedup.embedding_near_pairs(_vecset(spark, sf_dir), threshold=0.90)
    from ..caching import track_persist

    p = track_persist(pairs)
    counts = p.agg(
        F.count("*").cast("long").alias("n_pairs_90"),
        F.sum((F.col("cos") >= 0.95).cast("long")).cast("long").alias(
            "n_pairs_95"
        ),
        F.sum((F.col("cos") >= 0.99).cast("long")).cast("long").alias(
            "n_pairs_99"
        ),
    )
    vecs95 = (
        p.filter(F.col("cos") >= 0.95)
        .select(F.explode(F.array("vec_a", "vec_b")).alias("v"))
        .agg(F.countDistinct("v").cast("long").alias("n_vecs_95"))
    )
    return counts.crossJoin(F.broadcast(vecs95))


SQL_DEDUP_THRESHOLD_SENSITIVITY = f"""
with vecset as ({VECSET_SQL}),
v as (
  select vec_id, embedding::DOUBLE[] as e,
         {_SQL_NORM.format(a='embedding::DOUBLE[]')} as nrm
  from vecset
),
{_sql_lsh_bands_cte('v')},
hot as (
  select band, bval from bands group by 1, 2
  having count(*) > {similarity.MAX_VEC_BUCKET}
),
kept as (
  select b.* from bands b
  where not exists (select 1 from hot h where h.band = b.band and h.bval = b.bval)
),
cand as (
  select distinct l.vec_id as vec_a, r.vec_id as vec_b
  from kept l join kept r
    on l.band = r.band and l.bval = r.bval and l.vec_id < r.vec_id
),
scored as (
  select vec_a, vec_b,
         round({_SQL_DOT.format(a='vl.e', b='vr.e')} / (vl.nrm * vr.nrm), 3)
           as cos
  from cand p join v vl on p.vec_a = vl.vec_id
  join v vr on p.vec_b = vr.vec_id
),
pairs as (select * from scored where cos >= 0.90),
counts as (
  select count(*)::BIGINT as n_pairs_90,
         sum(case when cos >= 0.95 then 1 else 0 end)::BIGINT as n_pairs_95,
         sum(case when cos >= 0.99 then 1 else 0 end)::BIGINT as n_pairs_99
  from pairs
),
vecs as (
  select count(distinct u)::BIGINT as n_vecs_95
  from (select unnest([vec_a, vec_b]) as u from pairs where cos >= 0.95)
)
select n_pairs_90, n_pairs_95, n_pairs_99, n_vecs_95
from counts cross join vecs
"""


def q_dedup_shingle_df_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle document-frequency profile in dyadic bands: how many
    distinct 3-token shingles sit at df=1, 2-3, 4-7, … and what share of
    all postings each band carries — the measurement that justifies the
    stop-shingle cap (dedup.MAX_SHINGLE_DF): a fat high-df band is
    exactly the mass that would go quadratic in the LSH bucket join.
    Shape: the one shingle explode (slice-zip construction) → shingle
    rollup → bounded 7-row band rollup → 7-row share window. Postings =
    Σ df; the band ladder is the shared _DEG_BUCKET_CASE (ln banned)."""
    sh = dedup.shingles_df(_corpus(spark, sf_dir))
    dfs = sh.groupBy("shingle").agg(F.count("*").cast("long").alias("df"))
    b = dfs.selectExpr(
        f"cast({_DEG_BUCKET_CASE.format(d='df')} as bigint) as band", "df"
    )
    agg = b.groupBy("band").agg(
        F.count("*").cast("long").alias("n_shingles"),
        F.sum("df").cast("long").alias("n_postings"),
    )
    wt = Window.partitionBy()
    return agg.withColumn(
        "__tot", F.sum("n_postings").over(wt)
    ).selectExpr(
        "band",
        "n_shingles",
        "n_postings",
        "cast((n_postings * cast(1000000 as bigint)) div __tot as bigint)"
        " as posting_share_ppm",
    )


SQL_DEDUP_SHINGLE_DF_PROFILE = f"""
with corpus as ({CORPUS_SQL}), {_SQL_SHINGLES},
dfs as (select shingle, count(*)::BIGINT as df from sh group by shingle),
b as (
  select ({_DEG_BUCKET_CASE.format(d='df')})::BIGINT as band, df from dfs
),
agg as (
  select band, count(*)::BIGINT as n_shingles, sum(df)::BIGINT as n_postings
  from b group by band
)
select band, n_shingles, n_postings,
       ((n_postings * 1000000) // (sum(n_postings) over ()))::BIGINT
         as posting_share_ppm
from agg
"""


#: winnowing parameters: k-gram size and window width (Schleimer et al.,
#: "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03)
_WINNOW_K = 3
_WINNOW_W = 4


def q_dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint profile (the MOSS algorithm): per document,
    the min-hash of every sliding window of {_WINNOW_W} consecutive
    {_WINNOW_K}-gram hashes, deduplicated — a LOCAL fingerprinting
    scheme with a positional guarantee (any shared run of ≥ k+w-1
    tokens shares a fingerprint) that minhash's global sampling can't
    give. This entry reports the selection profile (k-grams vs distinct
    fingerprints kept) — the storage-budget curve for a winnowed
    index. Shape: pure array expressions, zero shuffle before the
    final projection; every derived array (shingles, hashes) is staged
    as a materialized COLUMN before a lambda touches it (captured
    EXPRESSIONS re-inline per element — the r4 lesson), and shingles
    build from zipped slices (dedup.shingles_df discipline)."""
    k, w = _WINNOW_K, _WINNOW_W
    docs = _t(spark, sf_dir, "documents")
    s1 = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).filter(F.size("toks") >= k + w - 1)
    s2 = s1.select(
        "doc_id", "toks", (F.size("toks") - F.lit(k - 1)).alias("m")
    )
    zipped = F.slice(F.col("toks"), 1, F.col("m"))
    for j in range(1, k):
        zipped = F.zip_with(
            zipped,
            F.slice(F.col("toks"), 1 + j, F.col("m")),
            lambda acc, t: F.concat_ws(" ", acc, t),
        )
    s3 = s2.select("doc_id", "m", zipped.alias("sh"))
    s4 = s3.select(
        "doc_id",
        "m",
        F.transform(
            F.col("sh"),
            lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
        ).alias("hashes"),
    )
    s5 = s4.select(
        "doc_id",
        "m",
        F.expr(
            f"transform(sequence(1, m - {w - 1}),"
            f" i -> array_min(slice(hashes, i, {w})))"
        ).alias("wins"),
    )
    return s5.selectExpr(
        "doc_id",
        "cast(m as bigint) as n_kgrams",
        "cast(size(array_distinct(wins)) as bigint) as n_fingerprints",
        "cast((cast(size(array_distinct(wins)) as bigint)"
        " * cast(1000000 as bigint)) div m as bigint) as fp_ppm",
    )


SQL_DEDUP_WINNOWING = f"""
with s1 as (
  select doc_id, string_split(text, ' ') as toks from documents
),
s2 as (
  select doc_id, toks, (len(toks) - {_WINNOW_K - 1})::BIGINT as m
  from s1 where len(toks) >= {_WINNOW_K + _WINNOW_W - 1}
),
s3 as (
  select doc_id, m,
         list_transform(range(1, m + 1),
           i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) as sh
  from s2
),
s4 as (
  select doc_id, m,
         list_transform(sh,
           s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) as hashes
  from s3
),
s5 as (
  select doc_id, m,
         list_transform(range(1, m - {_WINNOW_W - 2}),
           i -> list_min(hashes[i:i + {_WINNOW_W - 1}])) as wins
  from s4
)
select doc_id, m as n_kgrams,
       len(list_distinct(wins))::BIGINT as n_fingerprints,
       ((len(list_distinct(wins)) * 1000000) // m)::BIGINT as fp_ppm
from s5
"""


# --- session-40: CDC chunk dedup, param-order normalize, channel budget
#     split ------------------------------------------------------------------

#: content-defined chunking: boundary when the 3-gram hash ≡ 0 (mod 16)
#: → expected ~16-token chunks, boundaries keyed to CONTENT not position
_CDC_MASK = 16


def q_dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (the restic/borg/LBFS storage
    recipe): chunk boundaries fall where a rolling 3-gram hash ≡ 0 mod
    {_CDC_MASK}, so an insertion early in a page shifts ONE chunk, not
    every fixed-width block — then identical chunks across the corpus
    store once. ONE summary row: chunk count, distinct chunks, dup
    share and mean width — the dedup-at-rest savings estimate that
    complements document-level dedup (dedup_exact finds whole-page
    copies; CDC finds shared SPANS). Shape: posexplode + doc-bounded
    windows (lag-built grams, running boundary sum), struct-sorted
    chunk assembly (collect_list alone is unordered), one md5 per
    chunk, two bounded aggregates."""
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = toks.withColumn(
        "gram",
        F.concat_ws(" ", F.lag("tok", 2).over(w), F.lag("tok", 1).over(w), F.col("tok")),
    ).withColumn(
        "boundary",
        F.expr(
            "case when pos >= 2 and cast(conv(substr(md5(gram), 1, 8),"
            f" 16, 10) as bigint) % {_CDC_MASK} = 0 then 1 else 0 end"
        ),
    ).withColumn("chunk_id", F.sum("boundary").over(run))
    chunks = g.groupBy("doc_id", "chunk_id").agg(
        F.expr(
            "md5(array_join(transform(array_sort(collect_list(struct(pos, tok))),"
            " x -> x.tok), ' ')) as chash"
        ),
        F.count("*").cast("long").alias("n_toks"),
    )
    per_hash = chunks.groupBy("chash").agg(
        F.count("*").cast("long").alias("occ"),
        F.max("n_toks").cast("long").alias("w_toks"),
    )
    return per_hash.agg(
        F.sum("occ").cast("long").alias("n_chunks"),
        F.count("*").cast("long").alias("n_unique_chunks"),
        F.expr("cast(sum(occ * w_toks) as bigint)").alias("n_tokens"),
        F.expr("cast(sum((occ - 1) * w_toks) as bigint)").alias("dup_tokens"),
    ).selectExpr(
        "n_chunks",
        "n_unique_chunks",
        "n_tokens",
        "dup_tokens",
        "cast((dup_tokens * cast(1000000 as bigint)) div n_tokens as bigint)"
        " as dup_ppm",
        "cast(n_tokens div n_chunks as bigint) as mean_chunk_tokens",
    )


SQL_DEDUP_CDC_CHUNKS = f"""
with toks as (
  select doc_id, unnest(string_split(text, ' ')) as tok,
         generate_subscripts(string_split(text, ' '), 1) - 1 as pos
  from documents
),
g as (
  select doc_id, pos, tok,
         concat_ws(' ',
           lag(tok, 2) over (partition by doc_id order by pos),
           lag(tok, 1) over (partition by doc_id order by pos),
           tok) as gram
  from toks
),
b as (
  select doc_id, pos, tok,
         case when pos >= 2 and
           (('0x' || substr(md5(gram), 1, 8))::BIGINT) % {_CDC_MASK} = 0
           then 1 else 0 end as boundary
  from g
),
c as (
  select doc_id, pos, tok,
         sum(boundary) over (
           partition by doc_id order by pos
           rows between unbounded preceding and current row
         ) as chunk_id
  from b
),
chunks as (
  select doc_id, chunk_id,
         md5(string_agg(tok, ' ' order by pos)) as chash,
         count(*)::BIGINT as n_toks
  from c group by doc_id, chunk_id
),
per_hash as (
  select chash, count(*)::BIGINT as occ, max(n_toks)::BIGINT as w_toks
  from chunks group by chash
),
agg as (
  select sum(occ)::BIGINT as n_chunks,
         count(*)::BIGINT as n_unique_chunks,
         sum(occ * w_toks)::BIGINT as n_tokens,
         sum((occ - 1) * w_toks)::BIGINT as dup_tokens
  from per_hash
)
select n_chunks, n_unique_chunks, n_tokens, dup_tokens,
       ((dup_tokens * 1000000) // n_tokens)::BIGINT as dup_ppm,
       (n_tokens // n_chunks)::BIGINT as mean_chunk_tokens
from agg
"""


def q_dedup_granularity_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-granularity comparison card: exact duplicate share at the
    DOCUMENT grain vs the PARAGRAPH grain (the same PARA_CHUNK_RE
    chunks dedup_paragraph hashes), side by side — the one-table
    answer to "which dedup tier buys more": document-level dedup
    misses every shared paragraph inside distinct pages. Each grain is
    one hash rollup over the duplicate-bearing corpus; the two
    single-row summaries union (independent pipelines — the
    union-embeds trap needs shared lineage, which these don't
    have)."""
    from ..operators.dedup import PARA_CHUNK_RE

    corpus = _corpus(spark, sf_dir)
    doc = corpus.selectExpr("md5(text) as h").groupBy("h").agg(
        F.count("*").cast("long").alias("n")
    ).agg(
        F.expr("cast('document' as string) as granularity"),
        F.sum("n").cast("long").alias("n_units"),
        F.count("*").cast("long").alias("n_unique"),
    )
    para = corpus.select(
        F.explode(
            F.expr(f"regexp_extract_all(text, '{PARA_CHUNK_RE}', 0)")
        ).alias("chunk")
    ).selectExpr("md5(chunk) as h").groupBy("h").agg(
        F.count("*").cast("long").alias("n")
    ).agg(
        F.expr("cast('paragraph' as string) as granularity"),
        F.sum("n").cast("long").alias("n_units"),
        F.count("*").cast("long").alias("n_unique"),
    )
    return doc.unionByName(para).selectExpr(
        "granularity",
        "n_units",
        "n_unique",
        "cast(((n_units - n_unique) * cast(1000000 as bigint))"
        " div n_units as bigint) as dup_ppm",
    )


def _sql_dedup_granularity_card() -> str:
    from ..operators.dedup import PARA_CHUNK_RE

    return f"""
with corpus as ({CORPUS_SQL}),
doc as (
  select 'document' as granularity, sum(n)::BIGINT as n_units,
         count(*)::BIGINT as n_unique
  from (select md5(text) as h, count(*)::BIGINT as n
        from corpus group by md5(text))
),
para as (
  select 'paragraph' as granularity, sum(n)::BIGINT as n_units,
         count(*)::BIGINT as n_unique
  from (
    select md5(chunk) as h, count(*)::BIGINT as n
    from (select unnest(regexp_extract_all(text, '{PARA_CHUNK_RE}', 0))
            as chunk from corpus)
    group by md5(chunk)
  )
),
u as (select * from doc union all select * from para)
select granularity, n_units, n_unique,
       (((n_units - n_unique) * 1000000) // n_units)::BIGINT as dup_ppm
from u
"""
