"""traindata family query builders + DuckDB oracles (mechanically split from the catalog monolith)."""

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
    _BINPACK_HOST_EXPR,
    _H32,
    _SQL_QUALITY_M,
    _SQL_QUALITY_SCORE,
    _SQL_TOKENS,
    _corpus,
    _sql_simhash_wide,
    _sw_sql,
    _t,
)



SAMPLE_RATES = {"en": 0.5, "de": 0.25, "fr": 0.1}


def q_traindata_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — concat-and-chunk assignment of documents into
    fixed 2048-token training sequences via the scalable two-pass prefix sum
    (operators/packing.py; no single-partition window funnel). Integer
    arithmetic throughout, so the DuckDB global-window oracle matches
    exactly."""
    from ..operators.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    out = pack_sequences(docs, 2048)
    return out.select(
        "doc_id",
        "n_tokens",
        "tok_offset",
        F.col("seq_id").cast("long").alias("seq_id"),
        "offset_in_seq",
        "n_seqs_spanned",
    )


SQL_TRAINDATA_PACK_SEQUENCES = f"""
with d as (
  select doc_id, len({_SQL_TOKENS})::BIGINT as n_tokens from documents
), p as (
  select doc_id, n_tokens,
    coalesce(sum(n_tokens) over (order by doc_id
      rows between unbounded preceding and 1 preceding), 0)::BIGINT as tok_offset
  from d
)
select doc_id, n_tokens, tok_offset,
  tok_offset // 2048 as seq_id,
  tok_offset % 2048 as offset_in_seq,
  ((tok_offset + n_tokens - 1) // 2048) - (tok_offset // 2048) + 1 as n_seqs_spanned
from p
"""


def q_traindata_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus mixer: per-language keep rates (en 50%, de 25%,
    fr 10%, rest 0) decided by an md5 coin per doc — the reproducible
    replacement for rand()-based sampling in a pretraining-mix pipeline."""
    from ..operators.textstats import stratified_sample_flag

    corpus = _corpus(spark, sf_dir)
    return corpus.filter(
        stratified_sample_flag(F.col("doc_id"), F.col("lang"), SAMPLE_RATES)
    ).select("doc_id", "lang")


def _sql_stratified() -> str:
    cases = " ".join(
        f"when lang = '{k}' then {int(round(v * 10000))}"
        for k, v in sorted(SAMPLE_RATES.items())
    )
    coin = _H32.format(x="'samp|' || cast(doc_id as varchar)")
    return f"""
with corpus as ({CORPUS_SQL})
select doc_id, lang from corpus
where ({coin}) % 10000 < (case {cases} else 0 end)
"""


SQL_TRAINDATA_STRATIFIED_SAMPLE = _sql_stratified()


def q_traindata_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data cleaning pass over the derived corpus — the
    full FIVE-stage ladder a 100 TB pretraining corpus runs nightly:
    exact-dedup (md5 keeper), NEAR-dup dedup (MinHash-LSH pairs -> connected
    components -> keep only each cluster's canonical min-doc_id keeper),
    language filter (en by the heuristic), quality gate (score >= 0.5), and
    benchmark DECONTAMINATION (drop every surviving doc sharing a 3-gram
    with the eval set — broadcast eval n-gram index, map-side join; r3
    verdict item 8).

    Both dedup tiers apply: the component keeper removes near-dup cluster
    members (exact dups normally share every band and land in the same
    component), while the md5 keeper catches exact dups whose bucket the
    LSH hot-bucket cap dropped — neither filter subsumes the other."""
    from ..operators.textstats import tokens_col

    corpus = _corpus(spark, sf_dir)
    edges = dedup.minhash_lsh_pairs(corpus).select("doc_a", "doc_b")
    comp = dedup.connected_components(edges, corpus.select("doc_id"))
    near_keepers = comp.filter(F.col("doc_id") == F.col("component")).select("doc_id")
    h = F.md5("text").alias("text_md5")
    keeper = (
        corpus.select("doc_id", "text", "lang", h)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("text_md5").orderBy(F.asc("doc_id"))
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn", "text_md5")
        .join(near_keepers, "doc_id", "left_semi")
    )
    toks = tokens_col(F.col("text"))
    q = quality_score_cols(F.col("text"))
    cleaned = (
        keeper.withColumn("lang_pred", lang_id_col(toks))
        .withColumn("quality_score", q["quality_score"])
        .withColumn("n_tokens", q["n_tokens"])
        .filter((F.col("lang_pred") == "en") & (F.col("quality_score") >= 0.5))
    )
    # stage 5 — decontamination: same eval set as traindata_decontaminate
    # (every 97th source doc). Computed over the keeper set (final is a
    # subset, so the anti-join is identical) to reuse its pinned text.
    ev = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 97 == 0)
        .select(F.col("doc_id").alias("eval_id"), "text")
    )
    contaminated = dedup.decontaminate_ngrams(
        keeper.select("doc_id", "text"), ev, n=3
    ).select("doc_id")
    return cleaned.join(contaminated, "doc_id", "left_anti").select(
        "doc_id", "lang", "n_tokens", "quality_score"
    )


def _sql_traindata() -> str:
    from ..operators.textstats import STOPWORDS

    keys = []
    for lang, ws in sorted(STOPWORDS.items()):
        keys.append(
            f"lpad(((1000000 + -1 * {_sw_sql(ws)}))::VARCHAR, 7, '0') || '{lang}'"
        )
    least = "least(" + ", ".join(keys) + ")"
    anyhit = " + ".join(_sw_sql(ws) for _, ws in sorted(STOPWORDS.items()))
    return f"""
with corpus as ({CORPUS_SQL}),
comp as ({SQL_DEDUP_COMPONENTS}),
keeper as (
  select * from (
    select doc_id, text, lang,
           row_number() over (partition by md5(text) order by doc_id asc) as rn
    from corpus
  ) where rn = 1
    and doc_id in (select doc_id from comp where doc_id = component)
),
scored as (
  select doc_id, lang, text,
    len({_SQL_TOKENS})::BIGINT as n_tokens,
    length(text)::BIGINT as n_chars,
    {_sw_sql(("the", "a", "of", "and", "is", "to"))}::BIGINT as stop_en,
    case when ({anyhit}) = 0 then 'und' else substr({least}, 8) end as lang_pred
  from keeper
),
m as (
  select doc_id, lang, n_tokens, lang_pred,
    (n_chars - (n_tokens - 1)) / n_tokens::DOUBLE as mean_tok,
    stop_en / n_tokens::DOUBLE as stop_ratio,
    (n_chars - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g'))) / n_chars::DOUBLE as punct_ratio
  from scored
),
ev_docs as (select doc_id as eval_id, text from documents where doc_id % 97 = 0),
ev_sh as (
  select eval_id, unnest(list_distinct(
    list_transform(range(1, len({_SQL_TOKENS}) - 1),
                   i -> {_SQL_TOKENS}[i] || ' ' || {_SQL_TOKENS}[i + 1] || ' ' || {_SQL_TOKENS}[i + 2])
  )) as shingle from ev_docs where len({_SQL_TOKENS}) >= 3
),
kp_sh as (
  select doc_id, unnest(list_distinct(
    list_transform(range(1, len({_SQL_TOKENS}) - 1),
                   i -> {_SQL_TOKENS}[i] || ' ' || {_SQL_TOKENS}[i + 1] || ' ' || {_SQL_TOKENS}[i + 2])
  )) as shingle from keeper where len({_SQL_TOKENS}) >= 3
),
contaminated as (select distinct t.doc_id from kp_sh t join ev_sh e using (shingle))
select doc_id, lang, n_tokens,
  round({_SQL_QUALITY_SCORE}::DOUBLE, 2) as quality_score
from m
where lang_pred = 'en'
  and {_SQL_QUALITY_SCORE} >= 0.5
  and doc_id not in (select doc_id from contaminated)
"""


SQL_TRAINDATA_CLEAN_CORPUS = _sql_traindata()


def q_traindata_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.decontaminate_ngrams):
    eval set = every 97th source document; train side = the derived corpus
    (whose constructed exact/near duplicates of eval docs MUST be flagged —
    that is precisely the leak this pass exists to catch). n=3 at fixture
    scale (production uses 8-13-token windows; ~30-word fixture vocabulary)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ev = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    train = _corpus(spark, sf_dir).join(
        ev.select(F.col("eval_id").alias("doc_id")), "doc_id", "left_anti"
    )
    return dedup.decontaminate_ngrams(train, ev, n=3)


#: shared decontamination CTE prefix (train/eval shingle tables) — used by
#: both the per-train-doc scan and the per-eval contamination report
_SQL_DECON_CTES = f"""corpus as ({CORPUS_SQL}),
ev_docs as (select doc_id as eval_id, text from documents where doc_id % 97 = 0),
train as (
  select doc_id, text from corpus
  where doc_id not in (select eval_id from ev_docs)
),
tr_tok as (
  select doc_id, {_SQL_TOKENS} as toks from train where len({_SQL_TOKENS}) >= 3
),
tr_sh as (
  select doc_id, unnest(list_distinct(
    list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
  )) as shingle from tr_tok
),
ev_tok as (
  select eval_id, {_SQL_TOKENS} as toks from ev_docs where len({_SQL_TOKENS}) >= 3
),
ev_sh as (
  select eval_id, unnest(list_distinct(
    list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
  )) as shingle from ev_tok
)"""

SQL_TRAINDATA_DECONTAMINATE = f"""
with {_SQL_DECON_CTES}
select t.doc_id,
       count(distinct t.shingle)::BIGINT as n_hit_ngrams,
       count(distinct e.eval_id)::BIGINT as n_eval_docs
from tr_sh t join ev_sh e on t.shingle = e.shingle
group by 1
"""


def q_traindata_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (operators/mixing.domain_mix, τ=2):
    per-source sampling weights w ∝ sqrt(n) and the doc allocation of a
    100k-doc training budget. sqrt is IEEE-correctly-rounded so the weights
    are bit-identical across engines (pow/ln are not)."""
    from ..operators.mixing import domain_mix

    return domain_mix(_t(spark, sf_dir, "documents"), budget=100000)


SQL_TRAINDATA_DOMAIN_MIX = """
with counts as (select source, count(*)::BIGINT as n_docs from documents group by source),
z as (select sum(cast(sqrt(n_docs) as decimal(28,12)))::DOUBLE as z from counts)
select source, n_docs, round(sqrt(n_docs) / z, 6) as weight,
       floor(sqrt(n_docs) / z * 100000.0)::BIGINT as target_docs
from counts, z
"""

#: shard byte budget for the output manifest (bytes == chars in the ASCII
#: fixture; a binary corpus would swap in octet_length on both engines).
_SHARD_BUDGET = 65536


def q_traindata_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic output sharding for the packed corpus: each document is
    assigned the shard its byte-offset starts in (exclusive prefix sum of
    sizes in doc_id order div the shard budget), then a per-shard manifest
    row. The prefix sum is operators/packing.prefix_sum_scalable — the
    two-pass partition pattern, NOT a global window funnel; the manifest agg
    is one map-side-partial groupBy. Integer sums, so no fold-order hazard."""
    from ..operators.packing import prefix_sum_scalable

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    with_off = prefix_sum_scalable(docs, "n_chars", ["doc_id"], "cum_before")
    shard = F.expr(f"cum_before div {_SHARD_BUDGET}").cast("long").alias("shard_id")
    return (
        with_off.select(shard, "doc_id", "n_chars")
        .groupBy("shard_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("shard_bytes"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        )
    )


SQL_TRAINDATA_SHARD_MANIFEST = f"""
with cum as (
  select doc_id, n_chars,
         coalesce(sum(n_chars) over (order by doc_id
           rows between unbounded preceding and 1 preceding), 0) as cum_before
  from documents
)
select (cum_before // {_SHARD_BUDGET})::BIGINT as shard_id,
       count(*)::BIGINT as n_docs,
       sum(n_chars)::BIGINT as shard_bytes,
       min(doc_id)::BIGINT as first_doc,
       max(doc_id)::BIGINT as last_doc
from cum
group by 1
"""


_N_EPOCHS = 4


def q_traindata_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch deterministic reshuffle of the training shards — the
    dataloader order a resumable 100 TB run needs: every epoch visits every
    shard exactly once, in an order that (a) differs between epochs and
    (b) is a pure function of (epoch, shard_id), so any worker recomputes
    its slice from the manifest with zero coordination and a resumed run
    continues at the same position.

    Scale shape: the per-epoch rank is NOT a per-epoch window funnel (that
    would push millions of shards of one epoch through one task). The sort
    key is an md5-derived 32-bit value, so its own high bits are an
    order-aligned bucket: ranks ride ``ordering.assign_seq_bucketed`` on the
    integral lead ``epoch * 4096 + h div 2^20`` — one job, no sampling pass,
    no Python — and the within-epoch position is the global stamp minus
    ``epoch * n_shards`` (every epoch is a full pass, so epoch blocks are
    equal-sized by construction)."""
    from ..operators.ordering import assign_seq_bucketed
    from ..operators.packing import prefix_sum_scalable

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    with_off = prefix_sum_scalable(docs, "n_chars", ["doc_id"], "cum_before")
    shards = with_off.select(
        F.expr(f"cum_before div {_SHARD_BUDGET}").cast("long").alias("shard_id")
    ).distinct()
    n_shards = shards.count()  # manifest-sized relation: cheap, exact
    sched = shards.select(
        F.explode(F.sequence(F.lit(0), F.lit(_N_EPOCHS - 1))).alias("epoch"),
        "shard_id",
    ).select(
        F.col("epoch").cast("int").alias("epoch"),
        "shard_id",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("ep"),
                        F.col("epoch").cast("string"),
                        F.lit("|"),
                        F.col("shard_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    lead = (F.col("epoch").cast("long") * 4096 + F.expr("h div 1048576")).alias(
        "lead"
    )
    stamped = assign_seq_bucketed(
        sched.select(lead, "h", "epoch", "shard_id"),
        ["lead", "h", "shard_id"],
        "seq",
        lead_bounds=(0, _N_EPOCHS * 4096 - 1),
    )
    return stamped.select(
        "epoch",
        (F.col("seq") - F.col("epoch").cast("long") * n_shards).alias("position"),
        "shard_id",
    )


SQL_TRAINDATA_EPOCH_SCHEDULE = f"""
with cum as (
  select doc_id, n_chars,
         coalesce(sum(n_chars) over (order by doc_id
           rows between unbounded preceding and 1 preceding), 0) as cum_before
  from documents
),
shards as (select distinct (cum_before // {_SHARD_BUDGET})::BIGINT as shard_id from cum),
sched as (
  select e.epoch, s.shard_id,
         {_H32.format(x="'ep' || cast(e.epoch as varchar) || '|' || cast(s.shard_id as varchar)")} as h
  from shards s, (select unnest(range(0, {_N_EPOCHS})) as epoch) e
)
select epoch::INT as epoch,
       (row_number() over (partition by epoch order by h, shard_id) - 1)::BIGINT as position,
       shard_id
from sched
"""


def q_quality_classifier_hashgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style hashed-n-gram importance scoring (operators/classifier):
    bucket weights = scaled target-domain share per hashed token bucket
    (integer division — no log-likelihood, ln is not cross-engine
    bit-stable), doc score = integer sum of token weights. The weight
    table is bounded by N_BUCKETS, so it broadcasts by construction; the
    target domain here is the English slice of the corpus."""
    from ..operators.classifier import hashgram_scores, hashgram_weights

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("lang") == "en").alias("is_en")
    )
    weights = hashgram_weights(docs, "is_en")
    return hashgram_scores(docs, weights)


def _sql_quality_classifier_hashgram() -> str:
    from ..operators.classifier import N_BUCKETS, W_SCALE

    return f"""
with tok as (
  select doc_id, (case when lang = 'en' then 1 else 0 end) as is_t,
         unnest({_SQL_TOKENS}) as token
  from documents
),
b as (select doc_id, is_t, ({_H32.format(x='token')} % {N_BUCKETS})::INT as bucket
      from tok),
w as (select bucket, ((sum(is_t) * {W_SCALE}) // count(*))::BIGINT as w
      from b group by bucket)
select b.doc_id, count(*)::BIGINT as n_toks, sum(w.w)::BIGINT as score,
       round(sum(w.w)::DOUBLE / count(*)::DOUBLE, 6) as mean_w
from b join w using (bucket)
group by b.doc_id
"""


def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot change capture (sources/checkpoint.snapshot_diff): full
    outer join of two corpus versions on the key, payloads compared by
    map-side md5 so only 32-byte digests shuffle; output is O(churn).
    Planted churn: doc_id%17 removed, %13 changed, %19 re-added under a
    shifted key."""
    from ..sources.checkpoint import snapshot_diff

    docs = _t(spark, sf_dir, "documents")
    v1 = docs.select("doc_id", "text")
    v2 = (
        docs.filter(F.col("doc_id") % 17 != 0)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" [rev2]")))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 19 == 0).select(
                (F.col("doc_id") + 300000).alias("doc_id"), "text"
            )
        )
    )
    return snapshot_diff(v1, v2)


SQL_CORPUS_SNAPSHOT_DIFF = """
with v1 as (select doc_id, text from documents),
v2 as (
  select doc_id,
         case when doc_id % 13 = 0 then text || ' [rev2]' else text end as text
  from documents where doc_id % 17 <> 0
  union all
  select doc_id + 300000 as doc_id, text from documents where doc_id % 19 = 0
),
o as (select doc_id as k, md5(text) as old_digest from v1),
n as (select doc_id as k, md5(text) as new_digest from v2),
j as (
  select coalesce(o.k, n.k) as doc_id, old_digest, new_digest
  from o full outer join n on o.k = n.k
),
st as (
  select doc_id,
         case when old_digest is null then 'added'
              when new_digest is null then 'removed'
              when old_digest <> new_digest then 'changed'
              else 'unchanged' end as status,
         coalesce(old_digest, '') as old_digest,
         coalesce(new_digest, '') as new_digest
  from j
)
select * from st where status <> 'unchanged'
"""


def q_traindata_token_budget_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget data selection (operators/packing.token_budget_trim):
    greedy best-first prefix under a 15k-token budget via the scalable
    exclusive prefix sum (no global window funnel); straddlers drop whole."""
    from ..operators.packing import token_budget_trim

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        ((F.col("doc_id") * 37) % 100).cast("long").alias("score"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return token_budget_trim(docs, budget=15000)


SQL_TRAINDATA_TOKEN_BUDGET_TRIM = """
with d as (
  select doc_id, ((doc_id * 37) % 100)::BIGINT as score,
         len(string_split(text, ' '))::BIGINT as n_tokens
  from documents
),
c as (
  select *, coalesce(sum(n_tokens) over (
    order by score desc, doc_id
    rows between unbounded preceding and 1 preceding), 0)::BIGINT as tok_prefix
  from d
)
select doc_id, score, n_tokens, tok_prefix
from c where tok_prefix + n_tokens <= 15000
"""


# --- deterministic weighted dataset interleave (r4d) ------------------------

#: per-source weight, shared verbatim (1..4 derived from the name's last char)
_ILV_WEIGHT_EXPR = "ascii(right(source, 1)) % 4 + 1"


def q_traindata_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted block-cyclic dataset interleave
    (operators/mixing.interleave_datasets): the k-th doc of source s lands
    at slot (k div w_s)*W + offset_s + (k mod w_s) — per-source rank from
    ONE global scalable stamp (no per-source window funnel), integer
    arithmetic throughout."""
    from ..operators.mixing import interleave_datasets

    docs = _t(spark, sf_dir, "documents")
    weights = (
        docs.select("source")
        .distinct()
        .select("source", F.expr(_ILV_WEIGHT_EXPR).cast("long").alias("weight"))
    )
    return interleave_datasets(docs, weights)


SQL_TRAINDATA_INTERLEAVE = f"""
with d as (select doc_id, source from documents),
r as (
  select doc_id, source,
         (row_number() over (partition by source order by doc_id) - 1)::BIGINT as k
  from d
),
w as (
  select source, ({_ILV_WEIGHT_EXPR})::BIGINT as weight
  from (select distinct source from documents)
),
tw as (select sum(weight)::BIGINT as block_w from w),
o as (
  select source, weight,
         coalesce(sum(weight) over (
           order by source rows between unbounded preceding and 1 preceding
         ), 0)::BIGINT as block_offset
  from w
)
select r.doc_id, r.source, r.k, o.weight,
       ((r.k // o.weight) * tw.block_w + o.block_offset + (r.k % o.weight))::BIGINT
         as slot
from r join o on r.source = o.source, tw
"""


def q_quality_vs_dup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-auditing composition: does the quality scorer agree with the
    dedup tier? Per discrete quality-score value (the composite is a sum
    of 0.4/0.3/0.2/0.1 gates, so scores are exact tenths after the shared
    round): document count, exact-duplicate COPY count (non-keeper rows
    of md5 groups over the planted-dup corpus), and the dup rate. A bin
    whose dup rate spikes tells the pipeline its quality gate is letting
    boilerplate through. Scale shape: one digest groupBy + one equi join
    back + one tiny groupBy on the score key; the division is one
    per-row double op, rounded once."""
    corpus = _corpus(spark, sf_dir)
    score = quality_score_cols(F.col("text"))["quality_score"]
    scored = corpus.select(
        "doc_id", F.md5("text").alias("digest"), score.alias("q")
    )
    g = scored.groupBy("digest").agg(F.min("doc_id").alias("keeper_id"))
    tagged = scored.join(g, "digest").select(
        "q", (F.col("doc_id") > F.col("keeper_id")).cast("int").alias("is_copy")
    )
    return tagged.groupBy(F.col("q").alias("quality_score")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("is_copy").cast("long").alias("n_dup_copies"),
        F.round(
            F.sum("is_copy").cast("double") / F.count("*").cast("double"), 6
        ).alias("dup_rate"),
    )


SQL_QUALITY_VS_DUP_AUDIT = f"""
with corpus as ({CORPUS_SQL}),
{_SQL_QUALITY_M.replace("from documents", "from corpus")},
scored as (
  select m.doc_id, md5(c.text) as digest,
         round({_SQL_QUALITY_SCORE}::DOUBLE, 2) as q
  from m join corpus c using (doc_id)
),
g as (select digest, min(doc_id) as keeper_id from scored group by digest)
select s.q as quality_score, count(*)::BIGINT as n_docs,
       sum(case when s.doc_id > g.keeper_id then 1 else 0 end)::BIGINT
         as n_dup_copies,
       round(sum(case when s.doc_id > g.keeper_id then 1 else 0 end)::DOUBLE
             / count(*)::DOUBLE, 6) as dup_rate
from scored s join g using (digest)
group by s.q
"""


#: power-of-two token-length ladder shared verbatim ('{n}' = token count):
#: the packing planner's histogram domain
_LEN_BUCKET_EXPR = """case when {n} < 8 then 0 when {n} < 16 then 8
  when {n} < 32 then 16 when {n} < 64 then 32 when {n} < 128 then 64
  when {n} < 256 then 128 else 256 end"""


def q_traindata_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram for the packing planner — per power-of-two
    bucket: doc count, token mass, and each bucket's share of total
    tokens. traindata_pack_sequences consumes exactly this profile to
    size its bins; at 100 TB the histogram is what the driver can afford
    to look at (7 rows), never the lengths themselves. One map-side
    groupBy; the share divides by a window total over the 7-row bucket
    table (integer token sums are exact, one rounded division per row)."""
    from ..operators.textstats import tokens_col

    docs = _t(spark, sf_dir, "documents")
    n = F.size(tokens_col(F.col("text"))).cast("long")
    b = docs.select(
        F.expr(
            _LEN_BUCKET_EXPR.format(n="size(split(text, ' '))")
        ).cast("long").alias("bucket_lo"),
        n.alias("n_tokens"),
    )
    agg = b.groupBy("bucket_lo").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )
    w = Window.partitionBy()
    return agg.select(
        "bucket_lo",
        "n_docs",
        "total_tokens",
        F.round(
            F.col("total_tokens").cast("double")
            / F.sum("total_tokens").over(w).cast("double"),
            6,
        ).alias("token_share"),
    )


SQL_TRAINDATA_LENGTH_BUCKETS = f"""
with b as (
  select {_LEN_BUCKET_EXPR.format(n="len(string_split(text, ' '))")}::BIGINT
           as bucket_lo,
         len(string_split(text, ' '))::BIGINT as n_tokens
  from documents
), agg as (
  select bucket_lo, count(*)::BIGINT as n_docs,
         sum(n_tokens)::BIGINT as total_tokens
  from b group by bucket_lo
)
select bucket_lo, n_docs, total_tokens,
       round(total_tokens::DOUBLE / (sum(total_tokens) over ())::DOUBLE, 6)
         as token_share
from agg
"""


def q_traindata_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row dataset card — the corpus summary a training run is
    provisioned from: document/dup/language counts, token mass, and mean
    quality, composed from the same operators the pipeline gates with
    (digest groupBy for dups, the shared quality scorer, whitespace
    tokens). Scale shape: ONE pass builds per-doc columns, one global
    aggregate (map-side partial) reduces them; the dup count is
    n_rows - n_distinct_digests (no self-join). Mean quality follows the
    decimal-sum recipe (exact, order-free), one rounded division."""
    corpus = _corpus(spark, sf_dir)
    from ..operators.textstats import tokens_col

    score = quality_score_cols(F.col("text"))["quality_score"]
    base = corpus.select(
        F.md5("text").alias("digest"),
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
        "lang",
        score.alias("q"),
    )
    return base.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.count("*") - F.count_distinct("digest"))
        .cast("long")
        .alias("n_exact_dup_copies"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(
            F.sum(F.col("q").cast("decimal(18,4)")).cast("double") / F.count("*"),
            4,
        ).alias("mean_quality"),
    )


SQL_TRAINDATA_DATASET_CARD = f"""
with corpus as ({CORPUS_SQL}),
{_SQL_QUALITY_M.replace("from documents", "from corpus")},
card_base as (
  select md5(c.text) as digest,
         len(string_split(c.text, ' '))::BIGINT as n_tokens,
         c.lang,
         round({_SQL_QUALITY_SCORE}::DOUBLE, 2) as q
  from corpus c join m using (doc_id)
)
select count(*)::BIGINT as n_docs,
       (count(*) - count(distinct digest))::BIGINT as n_exact_dup_copies,
       count(distinct lang)::BIGINT as n_langs,
       sum(n_tokens)::BIGINT as total_tokens,
       round((sum(cast(q as decimal(18,4)))::DOUBLE / count(*)), 4)
         as mean_quality
from card_base
"""


#: OOV-rate vocabulary size — deliberately small so the fixture corpora
#: produce a non-trivial OOV tail (tokenizer-vocab induction proper is
#: vocab_induct_topk; this is its coverage-audit consumer).
OOV_VOCAB_K = 512


def q_traindata_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage audit: induce a top-K token vocabulary
    (cnt desc, token asc — the vocab_induct_topk ordering), then roll up
    the per-document out-of-vocabulary rate by the packing planner's
    power-of-two length ladder. The answer to "is the tokenizer's vocab
    big enough for this corpus, and where does it fail" — long documents
    usually carry the OOV mass.

    Scale shape: the top-K is TakeOrderedAndProject (per-partition
    partial top-K, no global sort); the vocab join IS a justified
    broadcast — bounded by the K=512 constant, not corpus-derived-sized
    (contrast the r3 ngram_jaccard finding, where the broadcast side
    grew with the corpus). Two passes over the token stream (induce +
    audit) — at 100 TB the vocab would be induced once offline, so the
    audit pass is the steady-state cost. Integer sums only; ONE double
    division per output row, floor-truncated."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(OOV_VOCAB_K)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    per_doc = (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
    )
    agg = per_doc.groupBy(
        F.expr(_LEN_BUCKET_EXPR.format(n="n_tokens"))
        .cast("long")
        .alias("bucket_lo")
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_oov").cast("long").alias("oov_tokens"),
    )
    return agg.select(
        "bucket_lo",
        "n_docs",
        "total_tokens",
        "oov_tokens",
        (
            F.floor(
                (
                    F.col("oov_tokens").cast("double")
                    / F.col("total_tokens").cast("double")
                )
                * F.lit(1000000.0)
            )
            / F.lit(1000000.0)
        ).alias("oov_rate"),
    )


SQL_TRAINDATA_OOV_RATE = f"""
with tok as (
  select doc_id, unnest(string_split(text, ' ')) as token from documents
),
vocab as (
  select token from (select token, count(*) as cnt from tok group by token)
  order by cnt desc, token limit {OOV_VOCAB_K}
),
pd as (
  select t.doc_id, count(*)::BIGINT as n_tokens,
         sum(case when v.token is null then 1 else 0 end)::BIGINT as n_oov
  from tok t left join vocab v on t.token = v.token
  group by t.doc_id
),
agg as (
  select {_LEN_BUCKET_EXPR.format(n="n_tokens")}::BIGINT as bucket_lo,
         count(*)::BIGINT as n_docs,
         sum(n_tokens)::BIGINT as total_tokens,
         sum(n_oov)::BIGINT as oov_tokens
  from pd group by 1
)
select bucket_lo, n_docs, total_tokens, oov_tokens,
       floor((oov_tokens::DOUBLE / total_tokens::DOUBLE) * 1000000.0)
         / 1000000.0 as oov_rate
from agg
"""


def q_traindata_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold split balance audit (operators/textstats.
    kfold_assign, k=5): md5-coin fold assignment + per-(fold, source)
    counts with integer ppm deviation from the ideal share. The
    reproducible-split sibling of traindata_stratified_sample (same
    hash kit, partition semantics instead of Bernoulli)."""
    from ..operators.textstats import kfold_assign

    return kfold_assign(_t(spark, sf_dir, "documents"), k=5)


SQL_TRAINDATA_KFOLD_ASSIGN = f"""
with f as (
  select ({_H32.format(x="'kfold|' || cast(doc_id as varchar(30))")} % 5) as fold,
         source as stratum
  from documents
), r as (
  select fold, stratum, count(*)::BIGINT as n_docs from f group by fold, stratum
), t as (
  select fold, stratum, n_docs,
         sum(n_docs) over (partition by stratum)::BIGINT as stratum_total
  from r
)
select fold, stratum, n_docs, stratum_total,
       floor(((n_docs * 5 - stratum_total) * 1000000) / (stratum_total * 5))::BIGINT
         as dev_ppm
from t
"""


def q_traindata_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility (chars per whitespace token, e3
    fixed-point) — the audit that decides whether a tokenizer's byte
    budget is fairly shared across languages before setting per-language
    sampling temperatures; high-fertility languages burn more context
    per word. All-integer (sums + one truncating division), ONE
    map-side-combined groupBy over the scan."""
    docs = _t(spark, sf_dir, "documents")
    agg = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("total_tokens"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "total_chars",
        "total_tokens",
        F.expr("(total_chars * 1000) div total_tokens").cast("long").alias(
            "chars_per_token_e3"
        ),
    )


SQL_TRAINDATA_TOKENIZER_FERTILITY = f"""
with agg as (
  select lang, count(*)::BIGINT as n_docs,
         sum(length(text))::BIGINT as total_chars,
         sum(len({_SQL_TOKENS}))::BIGINT as total_tokens
  from documents group by lang
)
select lang, n_docs, total_chars, total_tokens,
       ((total_chars * 1000) // total_tokens)::BIGINT as chars_per_token_e3
from agg
"""


_FUNNEL_STAGES = (
    "exact_dedup",
    "near_dedup",
    "lang_filter",
    "quality_gate",
    "decontaminate",
)


def q_traindata_funnel_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaning-pipeline funnel observability — one row per
    traindata_clean_corpus stage with (n_in, n_out, drop_ppm): the
    dashboard a corpus operator reads every nightly run to catch a stage
    suddenly eating the corpus (an over-aggressive near-dup threshold, a
    broken language model) BEFORE the training job starves. Cumulative-
    conjunction semantics: stage k's survivors are docs passing gates
    1..k, so n_out of the last row equals the clean_corpus output count
    by construction.

    One pass: every gate is a per-doc FLAG (exact keeper via the md5
    window, near keeper via the components join, lang/quality as scan
    expressions, contamination as a left anti-join flag), then ONE
    aggregate row of 6 conditional sums explodes into the 5 stage rows —
    no per-stage recount jobs, no union re-running the dedup pipeline
    (the r3 union-embeds lesson applied to observability)."""
    from ..operators.textstats import lang_id_col, quality_score_cols, tokens_col

    corpus = _corpus(spark, sf_dir)
    edges = dedup.minhash_lsh_pairs(corpus).select("doc_a", "doc_b")
    comp = dedup.connected_components(edges, corpus.select("doc_id"))
    near = comp.select(
        "doc_id", (F.col("doc_id") == F.col("component")).alias("f_near")
    )
    ev = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 97 == 0)
        .select(F.col("doc_id").alias("eval_id"), "text")
    )
    contaminated = dedup.decontaminate_ngrams(
        corpus.select("doc_id", "text"), ev, n=3
    ).select("doc_id").withColumn("f_cont", F.lit(True))
    toks = tokens_col(F.col("text"))
    q = quality_score_cols(F.col("text"))
    flags = (
        corpus.select(
            "doc_id",
            "text",
            F.row_number()
            .over(Window.partitionBy(F.md5("text")).orderBy(F.asc("doc_id")))
            .alias("__rn"),
        )
        .select(
            "doc_id",
            (F.col("__rn") == 1).alias("f_exact"),
            (lang_id_col(toks) == "en").alias("f_lang"),
            (q["quality_score"] >= 0.5).alias("f_quality"),
        )
        .join(near, "doc_id")
        .join(contaminated, "doc_id", "left")
        .withColumn("f_decont", F.coalesce(~F.col("f_cont"), F.lit(True)))
    )

    def _n(*fs: str) -> Column:
        cond = F.lit(True)
        for f in fs:
            cond = cond & F.col(f)
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    agg = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        _n("f_exact").alias("n1"),
        _n("f_exact", "f_near").alias("n2"),
        _n("f_exact", "f_near", "f_lang").alias("n3"),
        _n("f_exact", "f_near", "f_lang", "f_quality").alias("n4"),
        _n("f_exact", "f_near", "f_lang", "f_quality", "f_decont").alias("n5"),
    )
    rows = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).cast("long").alias("stage_id"),
                        F.lit(name).alias("stage"),
                        F.col(f"n{i}").alias("n_in"),
                        F.col(f"n{i + 1}").alias("n_out"),
                    )
                    for i, name in enumerate(_FUNNEL_STAGES)
                ]
            )
        ).alias("s")
    ).select("s.*")
    return rows.select(
        "stage_id",
        "stage",
        "n_in",
        "n_out",
        F.expr(
            "case when n_in = 0 then 0 else ((n_in - n_out) * 1000000) div n_in end"
        ).cast("long").alias("drop_ppm"),
    )


def _sql_traindata_funnel_audit() -> str:
    from ..operators.textstats import STOPWORDS

    keys = []
    for lang, ws in sorted(STOPWORDS.items()):
        keys.append(
            f"lpad(((1000000 + -1 * {_sw_sql(ws)}))::VARCHAR, 7, '0') || '{lang}'"
        )
    least = "least(" + ", ".join(keys) + ")"
    anyhit = " + ".join(_sw_sql(ws) for _, ws in sorted(STOPWORDS.items()))
    stage_rows = " union all ".join(
        f"select {i + 1} as stage_id, '{name}' as stage,"
        f" n{i} as n_in, n{i + 1} as n_out from agg"
        for i, name in enumerate(_FUNNEL_STAGES)
    )
    return f"""
with corpus as ({CORPUS_SQL}),
comp as ({SQL_DEDUP_COMPONENTS}),
ev_docs as (select doc_id as eval_id, text from documents where doc_id % 97 = 0),
ev_sh as (
  select unnest(list_distinct(
    list_transform(range(1, len({_SQL_TOKENS}) - 1),
                   i -> {_SQL_TOKENS}[i] || ' ' || {_SQL_TOKENS}[i + 1] || ' ' || {_SQL_TOKENS}[i + 2])
  )) as shingle from ev_docs where len({_SQL_TOKENS}) >= 3
),
tr_sh as (
  select doc_id, unnest(list_distinct(
    list_transform(range(1, len({_SQL_TOKENS}) - 1),
                   i -> {_SQL_TOKENS}[i] || ' ' || {_SQL_TOKENS}[i + 1] || ' ' || {_SQL_TOKENS}[i + 2])
  )) as shingle from corpus where len({_SQL_TOKENS}) >= 3
),
contaminated as (select distinct t.doc_id from tr_sh t
                 join (select distinct shingle from ev_sh) e using (shingle)),
scored as (
  select doc_id, text,
    row_number() over (partition by md5(text) order by doc_id asc) as rn,
    len({_SQL_TOKENS})::BIGINT as n_tokens,
    length(text)::BIGINT as n_chars,
    {_sw_sql(("the", "a", "of", "and", "is", "to"))}::BIGINT as stop_en,
    case when ({anyhit}) = 0 then 'und' else substr({least}, 8) end as lang_pred
  from corpus
),
m as (
  select doc_id, rn, lang_pred, n_tokens,
    (n_chars - (n_tokens - 1)) / n_tokens::DOUBLE as mean_tok,
    stop_en / n_tokens::DOUBLE as stop_ratio,
    (n_chars - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g'))) / n_chars::DOUBLE as punct_ratio
  from scored
),
flags as (
  select m.doc_id,
    m.rn = 1 as f_exact,
    exists (select 1 from comp c
            where c.doc_id = m.doc_id and c.doc_id = c.component) as f_near,
    m.lang_pred = 'en' as f_lang,
    {_SQL_QUALITY_SCORE} >= 0.5 as f_quality,
    not exists (select 1 from contaminated k where k.doc_id = m.doc_id) as f_decont
  from m
),
agg as (
  select count(*)::BIGINT as n0,
    sum(case when f_exact then 1 else 0 end)::BIGINT as n1,
    sum(case when f_exact and f_near then 1 else 0 end)::BIGINT as n2,
    sum(case when f_exact and f_near and f_lang then 1 else 0 end)::BIGINT as n3,
    sum(case when f_exact and f_near and f_lang and f_quality
        then 1 else 0 end)::BIGINT as n4,
    sum(case when f_exact and f_near and f_lang and f_quality and f_decont
        then 1 else 0 end)::BIGINT as n5
  from flags
),
stages as ({stage_rows})
select stage_id::BIGINT as stage_id, stage, n_in, n_out,
       (case when n_in = 0 then 0
             else ((n_in - n_out) * 1000000) // n_in end)::BIGINT as drop_ppm
from stages
"""


def q_traindata_pack_fragmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing fragmentation audit — per packed 2048-token sequence: how
    many documents intersect it, how many arrive whole vs split across a
    boundary, how many START here. Split documents need attention-mask
    resets mid-sequence and lose cross-boundary supervision; a packer
    whose split share creeps up is wasting tokens — this is the audit the
    dataloader team reads next to traindata_length_buckets. One explode
    of each doc's (seq_id .. seq_id+spanned-1) range over the scalable
    prefix-sum assignment (no per-seq window, no join)."""
    from ..operators.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    packed = pack_sequences(docs, 2048)
    spans = packed.select(
        "seq_id",
        "n_seqs_spanned",
        F.explode(
            F.sequence(
                F.col("seq_id"), F.col("seq_id") + F.col("n_seqs_spanned") - 1
            )
        ).alias("seq"),
    )
    agg = spans.groupBy("seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("n_seqs_spanned") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_whole_docs"),
        F.sum(F.when(F.col("n_seqs_spanned") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_split_docs"),
        F.sum(F.when(F.col("seq") == F.col("seq_id"), 1).otherwise(0))
        .cast("long")
        .alias("n_starts"),
    )
    return agg.select(
        F.col("seq").cast("long").alias("seq_id"),
        "n_docs",
        "n_whole_docs",
        "n_split_docs",
        "n_starts",
        (F.col("n_split_docs") > 0).alias("is_fragmented"),
    )


SQL_TRAINDATA_PACK_FRAGMENTATION = f"""
with packed as ({SQL_TRAINDATA_PACK_SEQUENCES}),
spans as (
  select seq_id, n_seqs_spanned,
         unnest(range(seq_id, seq_id + n_seqs_spanned)) as seq
  from packed
),
agg as (
  select seq, count(*)::BIGINT as n_docs,
         sum(case when n_seqs_spanned = 1 then 1 else 0 end)::BIGINT
           as n_whole_docs,
         sum(case when n_seqs_spanned > 1 then 1 else 0 end)::BIGINT
           as n_split_docs,
         sum(case when seq = seq_id then 1 else 0 end)::BIGINT as n_starts
  from spans group by seq
)
select seq::BIGINT as seq_id, n_docs, n_whole_docs, n_split_docs, n_starts,
       n_split_docs > 0 as is_fragmented
from agg
"""


def q_traindata_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: documents sorted best-quality-band-first with
    a deterministic md5 shuffle inside each band, stamped with a global
    training sequence via the barrier-free scalable stamp (O2 machinery —
    NOT a global window, which would funnel the corpus through one task).
    Band = floor(quality_score * 10): the score is a fixed-order sum of
    constants, so the double — and the band — is bit-identical across
    engines per row."""
    from ..operators.textstats import hash32_col

    docs = _t(spark, sf_dir, "documents")
    score = quality_score_cols(F.col("text"))["quality_score"]
    base = docs.select(
        "doc_id",
        F.floor(score * 10).cast("long").alias("band"),
        hash32_col(
            F.concat(F.lit("cur"), F.col("doc_id").cast("string"))
        ).alias("shuf"),
    ).withColumn("inv_band", (F.lit(10) - F.col("band")).cast("long"))
    out = assign_seq_scalable(
        base, ["inv_band", "shuf", "doc_id"], "curriculum_seq"
    )
    return out.select("doc_id", "band", "curriculum_seq")


SQL_TRAINDATA_CURRICULUM_ORDER = f"""
with {_SQL_QUALITY_M},
b as (
  select doc_id,
         floor({_SQL_QUALITY_SCORE}::DOUBLE * 10)::BIGINT as band,
         {_H32.format(x="'cur' || cast(doc_id as varchar(30))")} as shuf
  from m
)
select doc_id, band,
       (row_number() over (order by 10 - band, shuf, doc_id) - 1)::BIGINT
         as curriculum_seq
from b
"""

#: RAG chunking plan: window W tokens, stride S. Chunk count and overlap
#: have closed forms (k = 1 + ceil((n-W)/S); overlap = (k-1)*(W-S)) —
#: the plan needs NO explode, just per-row integer arithmetic
_CHUNK_W, _CHUNK_S = 120, 90


def q_traindata_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking plan per source (RAG/context chunks of
    W=120 tokens, stride 90): chunk counts, emitted-token volume and the
    overlap tax as ppm of emitted. Closed-form per-row arithmetic — no
    explode, one groupBy on source; integer-only output. Distinct from
    traindata_pack_sequences (concat packing) and length_buckets: this
    is the duplication COST of overlap-chunking a corpus."""
    from ..operators.textstats import tokens_col

    W, S = _CHUNK_W, _CHUNK_S
    d = _t(spark, sf_dir, "documents").select(
        "source", F.size(tokens_col(F.col("text"))).cast("long").alias("n_tok")
    )
    k = F.when(F.col("n_tok") <= W, F.lit(1).cast("long")).otherwise(
        F.expr(f"1 + ((n_tok - {W} + {S - 1}) div {S})")
    )
    c = d.withColumn("k", k).withColumn(
        "emitted",
        (F.col("k") - 1) * W + (F.col("n_tok") - (F.col("k") - 1) * S),
    )
    agg = c.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.sum("k").cast("long").alias("n_chunks"),
        F.sum("emitted").cast("long").alias("n_emitted"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_tokens",
        "n_chunks",
        "n_emitted",
        F.expr(
            "cast(((n_emitted - n_tokens) * cast(1000000 as bigint))"
            " div n_emitted as bigint)"
        ).alias("overlap_ppm"),
    )


SQL_TRAINDATA_CHUNK_OVERLAP = f"""
with d as (
  select source, len(string_split(text, ' '))::BIGINT as n_tok
  from documents
),
c as (
  select source, n_tok,
         case when n_tok <= {_CHUNK_W} then 1
              else 1 + ((n_tok - {_CHUNK_W} + {_CHUNK_S - 1}) // {_CHUNK_S})
         end as k
  from d
),
e as (
  select source, n_tok, k,
         (k - 1) * {_CHUNK_W} + (n_tok - (k - 1) * {_CHUNK_S}) as emitted
  from c
)
select source, count(*)::BIGINT as n_docs,
       sum(n_tok)::BIGINT as n_tokens,
       sum(k)::BIGINT as n_chunks,
       sum(emitted)::BIGINT as n_emitted,
       (((sum(emitted) - sum(n_tok)) * 1000000) // sum(emitted))::BIGINT
         as overlap_ppm
from e group by source
"""

#: cross-source contamination plant: doc_id % 211 defines fingerprint
#: groups that span sources, so some fingerprints occur in 2+ sources
_OVERLAP_FP_EXPR = "cast(doc_id % 211 as varchar(10))"


def q_corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate overlap matrix: for every source pair, how
    many document fingerprints they share — the contamination audit run
    before mixing corpora (a CC snapshot that largely contains the
    books source inflates that domain's effective epochs). Shape: the
    distinct (fp, source) table is persisted ONCE and used as both
    self-join sides (the r3 union/self-join lesson); per-fp fan-out is
    bounded by the source vocabulary, never the corpus; totals attach
    on the pair keys. Integer-only output."""
    from ..caching import track_persist
    from ..operators.textstats import hash32_col

    fps = track_persist(
        _t(spark, sf_dir, "documents")
        .select(
            hash32_col(F.expr(_OVERLAP_FP_EXPR)).alias("fp"), "source"
        )
        .distinct()
    )
    tot = fps.groupBy("source").agg(F.count("*").cast("long").alias("tot"))
    pairs = (
        fps.alias("a")
        .join(fps.alias("b"), "fp")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    out = (
        pairs.join(tot.withColumnRenamed("source", "source_a"), "source_a")
        .withColumnRenamed("tot", "tot_a")
        .join(
            tot.withColumnRenamed("source", "source_b").withColumnRenamed(
                "tot", "tot_b"
            ),
            "source_b",
        )
    )
    return out.select(
        "source_a",
        "source_b",
        "n_shared",
        "tot_a",
        "tot_b",
        F.expr(
            "cast((n_shared * cast(1000000 as bigint))"
            " div least(tot_a, tot_b) as bigint)"
        ).alias("overlap_ppm"),
    )


SQL_CORPUS_SOURCE_OVERLAP = f"""
with fps as (
  select distinct
         ('0x' || substr(md5({_OVERLAP_FP_EXPR}), 1, 8))::BIGINT as fp,
         source
  from documents
),
tot as (select source, count(*)::BIGINT as tot from fps group by source),
pairs as (
  select a.source as source_a, b.source as source_b,
         count(*)::BIGINT as n_shared
  from fps a join fps b using (fp)
  where a.source < b.source
  group by 1, 2
)
select source_a, source_b, n_shared, ta.tot as tot_a, tb.tot as tot_b,
       ((n_shared * 1000000) // least(ta.tot, tb.tot))::BIGINT
         as overlap_ppm
from pairs
join tot ta on pairs.source_a = ta.source
join tot tb on pairs.source_b = tb.source
"""


#: classifier pair under audit: A = length gate, B = vocabulary-diversity
#: gate (distinct/total >= 0.6 by integer cross-multiplication) — both
#: pure integer predicates shared in spirit (not text: the split builtins
#: differ) between engines
_KAPPA_A_MIN_CHARS = 120


def q_quality_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-classifier agreement (Cohen's kappa) between two document
    quality gates — the audit that decides whether a cheap gate can
    replace an expensive one in the cleaning ladder (kappa ~ 0: the
    gates disagree beyond chance; kappa ~ 1: redundant). Shape: one scan
    computes both integer predicates, ONE global aggregate with map-side
    partials (4 exact BIGINT counts), then the kappa formula is pure
    per-value double arithmetic over exact counts (< 2^53) with
    floor-ppm projection (the round() tie trap) — bit-identical across
    engines. Guard: pe = 1 (degenerate marginals) yields NULL kappa."""
    docs = _t(spark, sf_dir, "documents")
    flags = docs.selectExpr(
        f"case when n_chars >= {_KAPPA_A_MIN_CHARS} then 1 else 0 end as a",
        "case when size(array_distinct(split(text, ' '))) * 10"
        " >= size(split(text, ' ')) * 6 then 1 else 0 end as b",
    )
    agg = flags.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("a").cast("long").alias("a_pos"),
        F.sum("b").cast("long").alias("b_pos"),
        F.sum(F.expr("case when a = b then 1 else 0 end"))
        .cast("long")
        .alias("n_agree"),
    )
    return agg.selectExpr(
        "n",
        "a_pos",
        "b_pos",
        "n_agree",
        *_KAPPA_PROJ,
    )


#: kappa projection — IDENTICAL text in Spark and DuckDB (per-value double
#: arithmetic over exact BIGINT counts is bit-identical; floor is exact)
_KAPPA_PROJ = [
    "cast(floor(cast(n_agree as double) / cast(n as double) * 1000000.0)"
    " as bigint) as po_ppm",
    "cast(floor((cast(a_pos as double) * cast(b_pos as double)"
    " + cast(n - a_pos as double) * cast(n - b_pos as double))"
    " / (cast(n as double) * cast(n as double)) * 1000000.0)"
    " as bigint) as pe_ppm",
    "cast(floor(case when cast(a_pos as double) * cast(b_pos as double)"
    " + cast(n - a_pos as double) * cast(n - b_pos as double)"
    " = cast(n as double) * cast(n as double) then null else"
    " (cast(n_agree as double) / cast(n as double)"
    "  - (cast(a_pos as double) * cast(b_pos as double)"
    "     + cast(n - a_pos as double) * cast(n - b_pos as double))"
    "    / (cast(n as double) * cast(n as double)))"
    " / (1.0 - (cast(a_pos as double) * cast(b_pos as double)"
    "           + cast(n - a_pos as double) * cast(n - b_pos as double))"
    "          / (cast(n as double) * cast(n as double)))"
    " end * 1000000.0) as bigint) as kappa_ppm",
]


SQL_QUALITY_LABEL_AGREEMENT = f"""
with flags as (
  select case when n_chars >= {_KAPPA_A_MIN_CHARS} then 1 else 0 end as a,
         case when len(list_distinct(string_split(text, ' '))) * 10
                   >= len(string_split(text, ' ')) * 6
              then 1 else 0 end as b
  from documents
),
agg as (
  select count(*)::BIGINT as n, sum(a)::BIGINT as a_pos,
         sum(b)::BIGINT as b_pos,
         sum(case when a = b then 1 else 0 end)::BIGINT as n_agree
  from flags
)
select n, a_pos, b_pos, n_agree, {', '.join(_KAPPA_PROJ)}
from agg
"""


def q_traindata_source_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card: the one-page corpus summary a dataset
    release ships — doc and unique-doc counts, exact-dup share, token
    mass, mean tokens, dominant language. Shape: tokens and the md5
    fingerprint compute in one scan; a (source, fp) pre-aggregate makes
    the dup share a SECOND map-side rollup (no join back to the corpus);
    the dominant language attaches via a row_number over the BOUNDED
    (source x lang) rollup, joined on the tiny source key. Integer/ppm
    only."""
    docs = _t(spark, sf_dir, "documents").selectExpr(
        "source",
        "lang",
        "md5(text) as fp",
        "cast(size(split(text, ' ')) as bigint) as n_tokens",
    )
    by_fp = docs.groupBy("source", "fp").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("n_tokens").cast("long").alias("tok"),
    )
    card = by_fp.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_unique"),
        F.sum(F.expr("case when n > 1 then n - 1 else 0 end"))
        .cast("long")
        .alias("n_dup"),
        F.sum("tok").cast("long").alias("total_tokens"),
    )
    by_lang = docs.groupBy("source", "lang").agg(
        F.count("*").alias("nl")
    )
    wl = Window.partitionBy("source").orderBy(F.desc("nl"), F.asc("lang"))
    top = (
        by_lang.withColumn("r", F.row_number().over(wl))
        .filter(F.col("r") == 1)
        .select(
            "source",
            F.col("lang").alias("top_lang"),
            F.col("nl").cast("long").alias("top_lang_n"),
        )
    )
    return card.join(top, "source").selectExpr(
        "source",
        "n_docs",
        "n_unique",
        "cast((n_dup * cast(1000000 as bigint)) div n_docs as bigint)"
        " as dup_ppm",
        "total_tokens",
        "cast((total_tokens * cast(1000000 as bigint)) div n_docs as bigint)"
        " as mean_tokens_ppm",
        "top_lang",
        "cast((top_lang_n * cast(1000000 as bigint)) div n_docs as bigint)"
        " as top_lang_ppm",
    )


SQL_TRAINDATA_SOURCE_CARD = """
with docs as (
  select source, lang, md5(text) as fp,
         len(string_split(text, ' '))::BIGINT as n_tokens
  from documents
),
by_fp as (
  select source, fp, count(*)::BIGINT as n, sum(n_tokens)::BIGINT as tok
  from docs group by source, fp
),
card as (
  select source, sum(n)::BIGINT as n_docs, count(*)::BIGINT as n_unique,
         sum(case when n > 1 then n - 1 else 0 end)::BIGINT as n_dup,
         sum(tok)::BIGINT as total_tokens
  from by_fp group by source
),
by_lang as (
  select source, lang, count(*) as nl from docs group by source, lang
),
top as (
  select source, lang as top_lang, nl::BIGINT as top_lang_n
  from (
    select *, row_number() over (
      partition by source order by nl desc, lang asc
    ) as r
    from by_lang
  ) where r = 1
)
select c.source, n_docs, n_unique,
       ((n_dup * 1000000) // n_docs)::BIGINT as dup_ppm,
       total_tokens,
       ((total_tokens * 1000000) // n_docs)::BIGINT as mean_tokens_ppm,
       top_lang,
       ((top_lang_n * 1000000) // n_docs)::BIGINT as top_lang_ppm
from card c join top t on c.source = t.source
"""


#: calibration bands = integer deciles of the OBSERVED mean-weight range
#: ((avgw - mn) * 10) div (mx - mn + 1), 0..9 — hashed-n-gram scores smear
#: toward the corpus mean (measured spread ~4% of W_SCALE), so absolute
#: banding would collapse to one band; all integer (no float banding ties)
_CALIB_N_BANDS = 10


def q_quality_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability audit of the hashed-n-gram quality classifier: band
    documents into integer deciles of the observed mean-token-weight
    range and report the empirical target-domain rate per band — the
    calibration curve that says whether a higher DSIR-style score
    actually means 'more English'. A monotone rate ladder validates
    threshold-based selection; a flat one means the classifier is noise
    at that granularity. Shape: reuses hashgram_weights/hashgram_scores
    (bounded N_BUCKETS broadcast, one token-explode groupBy); the range
    endpoints are the accepted 1-row broadcast; the rollup is bounded by
    _CALIB_N_BANDS. All-integer: range-relative banding by div (float
    banding has cross-engine ties), rate in exact ppm, per-band mean
    weight by integer division."""
    from ..caching import track_persist
    from ..operators.classifier import hashgram_scores, hashgram_weights

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("lang") == "en").alias("is_en")
    )
    weights = hashgram_weights(docs, "is_en")
    flags = docs.select("doc_id", F.col("is_en").cast("long").alias("is_t"))
    # persisted ONCE: the doc-score table feeds both the range endpoints
    # and the banding projection (the r3 self-reference re-run lesson)
    scored = track_persist(
        hashgram_scores(docs, weights)
        .join(flags, "doc_id")
        .selectExpr("score div n_toks as avgw", "is_t")
    )
    rng = scored.agg(
        F.min("avgw").alias("mn"), F.max("avgw").alias("mx")
    )
    banded = scored.crossJoin(F.broadcast(rng)).selectExpr(
        f"cast(((avgw - mn) * {_CALIB_N_BANDS}) div (mx - mn + 1) as bigint)"
        " as band",
        "avgw",
        "is_t",
    )
    return (
        banded.groupBy("band")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("is_t").cast("long").alias("n_target"),
            F.sum("avgw").cast("long").alias("sum_avgw"),
        )
        .selectExpr(
            "band",
            "n_docs",
            "n_target",
            "cast((n_target * cast(1000000 as bigint)) div n_docs as bigint)"
            " as target_rate_ppm",
            "cast(sum_avgw div n_docs as bigint) as mean_avgw",
        )
    )


def _sql_quality_score_calibration() -> str:
    from ..operators.classifier import N_BUCKETS, W_SCALE

    return f"""
with tok as (
  select doc_id, (case when lang = 'en' then 1 else 0 end) as is_t,
         unnest({_SQL_TOKENS}) as token
  from documents
),
b as (select doc_id, is_t, ({_H32.format(x='token')} % {N_BUCKETS})::INT as bucket
      from tok),
w as (select bucket, ((sum(is_t) * {W_SCALE}) // count(*))::BIGINT as w
      from b group by bucket),
doc as (
  select b.doc_id, max(b.is_t) as is_t, count(*)::BIGINT as n_toks,
         sum(w.w)::BIGINT as score
  from b join w on b.bucket = w.bucket
  group by b.doc_id
),
scored as (select score // n_toks as avgw, is_t from doc),
rng as (select min(avgw) as mn, max(avgw) as mx from scored),
banded as (
  select (((avgw - mn) * {_CALIB_N_BANDS}) // (mx - mn + 1))::BIGINT as band,
         avgw, is_t
  from scored cross join rng
)
select band, count(*)::BIGINT as n_docs, sum(is_t)::BIGINT as n_target,
       ((sum(is_t) * 1000000) // count(*))::BIGINT as target_rate_ppm,
       (sum(avgw) // count(*))::BIGINT as mean_avgw
from banded group by band
"""


def q_traindata_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-savings forecast of exact dedup, per source — the number a
    100 TB ingest pipeline quotes before running the expensive near-dup
    tiers: bytes that vanish if every md5-identical document keeps only
    its min-doc_id copy. Shape: one md5 projection, one groupBy for the
    keeper table, one shuffle equi-join on the hash (the dedup_exact
    plan), then a bounded per-source rollup; savings in exact integer
    ppm. Complements dedup_cluster_stats (cluster geometry) and
    quality_vs_dup_audit (quality correlation) with the byte ledger."""
    d = _t(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars", F.md5("text").alias("h")
    )
    keep = d.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    j = d.join(keep, "h").withColumn(
        "is_dup", (F.col("doc_id") != F.col("keeper")).cast("long")
    )
    return (
        j.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("is_dup").cast("long").alias("n_dup"),
            F.sum("n_chars").cast("long").alias("bytes_total"),
            F.sum(F.col("is_dup") * F.col("n_chars"))
            .cast("long")
            .alias("bytes_dup"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "n_dup",
            "bytes_total",
            "bytes_dup",
            "cast((bytes_dup * cast(1000000 as bigint))"
            " div bytes_total as bigint) as savings_ppm",
        )
    )


SQL_TRAINDATA_DEDUP_SAVINGS = """
with d as (select source, doc_id, n_chars, md5(text) as h from documents),
keep as (select h, min(doc_id) as keeper from d group by h),
j as (
  select source, n_chars,
         (case when doc_id <> keeper then 1 else 0 end)::BIGINT as is_dup
  from d join keep using (h)
)
select source, count(*)::BIGINT as n_docs, sum(is_dup)::BIGINT as n_dup,
       sum(n_chars)::BIGINT as bytes_total,
       sum(is_dup * n_chars)::BIGINT as bytes_dup,
       ((sum(is_dup * n_chars) * 1000000) // sum(n_chars))::BIGINT
         as savings_ppm
from j group by source
"""


#: context-length sweep grid (tokens per training sequence)
_CTX_GRID = (128, 256, 512)


def q_traindata_context_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length capacity sweep: for each candidate training context
    W, how the corpus splits into sequences — docs that fit whole, total
    chunks at ceil(n_tok / W), and the padding tax of the last partial
    chunk per doc (k*W - n_tok) in exact ppm of capacity. The
    sizing table a pretraining run reads to pick W before committing to
    a packing layout (traindata_pack_sequences then packs at the chosen
    W; traindata_chunk_overlap prices the OVERLAP variant). Shape: one
    tokenize projection, a 3-value grid explode (bounded fan-out), one
    groupBy on W. Closed forms only — no per-chunk explode."""
    from ..operators.textstats import tokens_col

    grid = ", ".join(str(w) for w in _CTX_GRID)
    d = _t(spark, sf_dir, "documents").select(
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tok")
    )
    g = d.select(
        "n_tok", F.explode(F.expr(f"array({grid})")).alias("w0")
    ).selectExpr("n_tok", "cast(w0 as long) as w")
    c = g.selectExpr(
        "w",
        "n_tok",
        "case when n_tok <= w then 1 else 0 end as fits",
        "(n_tok + w - 1) div w as k",
    ).selectExpr("w", "n_tok", "fits", "k", "k * w - n_tok as pad")
    return (
        c.groupBy("w")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("fits").cast("long").alias("n_fit_whole"),
            F.sum("k").cast("long").alias("n_chunks"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum("pad").cast("long").alias("pad_tokens"),
        )
        .selectExpr(
            "w",
            "n_docs",
            "n_fit_whole",
            "n_chunks",
            "n_tokens",
            "pad_tokens",
            "cast((pad_tokens * cast(1000000 as bigint))"
            " div (n_chunks * w) as bigint) as pad_ppm",
        )
    )


def _sql_traindata_context_sweep() -> str:
    grid = ", ".join(str(w) for w in _CTX_GRID)
    return f"""
with d as (select len({_SQL_TOKENS})::BIGINT as n_tok from documents),
g as (select n_tok, w::BIGINT as w from d, unnest([{grid}]) as t(w)),
c as (
  select w, n_tok,
         case when n_tok <= w then 1 else 0 end as fits,
         (n_tok + w - 1) // w as k
  from g
),
p as (select w, n_tok, fits, k, k * w - n_tok as pad from c)
select w, count(*)::BIGINT as n_docs, sum(fits)::BIGINT as n_fit_whole,
       sum(k)::BIGINT as n_chunks, sum(n_tok)::BIGINT as n_tokens,
       sum(pad)::BIGINT as pad_tokens,
       ((sum(pad) * 1000000) // (sum(k) * w))::BIGINT as pad_ppm
from p group by w
"""


def q_traindata_mix_rebalance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing plan: turn the τ=2 temperature allocation
    (traindata_domain_mix) into per-source ACTIONS — upsample factor (in
    exact ppm, = repeat rate for the dataloader) when the target exceeds
    the available docs, downsample keep-rate otherwise. The executable
    half of mixture design: domain_mix says what the mix SHOULD be, this
    says what to do to each source to get there. Shape: the bounded
    per-source mix table from domain_mix plus one integer projection;
    sqrt-only floats (IEEE-exact), factors in integer ppm."""
    from ..operators.mixing import domain_mix

    mix = domain_mix(_t(spark, sf_dir, "documents"), budget=100000)
    return mix.selectExpr(
        "source",
        "n_docs",
        "target_docs",
        "case when target_docs > n_docs then 'upsample'"
        " when target_docs < n_docs then 'downsample'"
        " else 'keep' end as action",
        "cast((target_docs * cast(1000000 as bigint)) div n_docs as bigint)"
        " as factor_ppm",
        "cast((target_docs + n_docs - 1) div n_docs as bigint) as epochs_needed",
    )


SQL_TRAINDATA_MIX_REBALANCE_PLAN = """
with counts as (
  select source, count(*)::BIGINT as n_docs from documents group by source
),
z as (
  select sum(cast(sqrt(n_docs) as decimal(28,12)))::DOUBLE as z from counts
),
mix as (
  select source, n_docs,
         floor(sqrt(n_docs) / z * 100000.0)::BIGINT as target_docs
  from counts, z
)
select source, n_docs, target_docs,
       case when target_docs > n_docs then 'upsample'
            when target_docs < n_docs then 'downsample'
            else 'keep' end as action,
       ((target_docs * 1000000) // n_docs)::BIGINT as factor_ppm,
       ((target_docs + n_docs - 1) // n_docs)::BIGINT as epochs_needed
from mix
"""


def q_traindata_contamination_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-benchmark contamination report (operators/dedup.
    contamination_report): the eval-side rollup of the decontamination
    scan — which eval documents leak into training data, through how many
    train docs and how many distinct n-grams. Same eval split and n=3
    window as traindata_decontaminate (the two entries are the two faces
    of one broadcast-index join)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ev = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    train = _corpus(spark, sf_dir).join(
        ev.select(F.col("eval_id").alias("doc_id")), "doc_id", "left_anti"
    )
    return dedup.contamination_report(train, ev, n=3)


SQL_TRAINDATA_CONTAMINATION_REPORT = f"""
with {_SQL_DECON_CTES}
select e.eval_id,
       count(distinct t.doc_id)::BIGINT as n_train_docs,
       count(distinct t.shingle)::BIGINT as n_shared_ngrams
from tr_sh t join ev_sh e on t.shingle = e.shingle
group by 1
"""


def q_quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate threshold sweep: for every observed quality score
    (discrete tenths — the composite is a sum of 0.4/0.3/0.2/0.1 gates),
    what a keep-if-q>=t policy retains — docs, bytes, exact-dup copies
    and the retained dup rate. The selection curve read before fixing
    the clean_corpus quality cutoff: the right threshold keeps bytes
    while shedding the dup-heavy low bins (quality_vs_dup_audit shows
    the per-bin correlation; this shows the cumulative consequence).
    Shape: one digest groupBy + join (the dedup_exact plan), a bounded
    per-score rollup, and a cumulative window over <= 11 score rows.
    Integer ppm; the score key reuses the entry-proven rounded double."""
    corpus = _corpus(spark, sf_dir)
    score = quality_score_cols(F.col("text"))["quality_score"]
    scored = corpus.select(
        "doc_id",
        F.md5("text").alias("digest"),
        score.alias("q"),
        F.length("text").cast("long").alias("n_chars"),
    )
    g = scored.groupBy("digest").agg(F.min("doc_id").alias("keeper_id"))
    tagged = scored.join(g, "digest").select(
        "q",
        "n_chars",
        (F.col("doc_id") > F.col("keeper_id")).cast("long").alias("is_copy"),
    )
    per_q = tagged.groupBy("q").agg(
        F.count("*").cast("long").alias("nd"),
        F.sum("n_chars").cast("long").alias("nb"),
        F.sum("is_copy").cast("long").alias("nc"),
    )
    w = Window.orderBy(F.desc("q")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_q.select(
        F.col("q").alias("threshold"),
        F.sum("nd").over(w).cast("long").alias("n_kept"),
        F.sum("nb").over(w).cast("long").alias("bytes_kept"),
        F.sum("nc").over(w).cast("long").alias("dups_kept"),
    ).selectExpr(
        "threshold",
        "n_kept",
        "bytes_kept",
        "dups_kept",
        "cast((dups_kept * cast(1000000 as bigint)) div n_kept as bigint)"
        " as dup_ppm_kept",
    )


SQL_QUALITY_THRESHOLD_SWEEP = f"""
with corpus as ({CORPUS_SQL}),
{_SQL_QUALITY_M.replace("from documents", "from corpus")},
scored as (
  select m.doc_id, md5(c.text) as digest,
         round({_SQL_QUALITY_SCORE}::DOUBLE, 2) as q,
         length(c.text)::BIGINT as n_chars
  from m join corpus c using (doc_id)
),
g as (select digest, min(doc_id) as keeper_id from scored group by digest),
tagged as (
  select q, n_chars,
         (case when s.doc_id > g.keeper_id then 1 else 0 end)::BIGINT
           as is_copy
  from scored s join g using (digest)
),
per_q as (
  select q, count(*)::BIGINT as nd, sum(n_chars)::BIGINT as nb,
         sum(is_copy)::BIGINT as nc
  from tagged group by q
),
cum as (
  select q as threshold,
         sum(nd) over (order by q desc
                       rows between unbounded preceding and current row)
           ::BIGINT as n_kept,
         sum(nb) over (order by q desc
                       rows between unbounded preceding and current row)
           ::BIGINT as bytes_kept,
         sum(nc) over (order by q desc
                       rows between unbounded preceding and current row)
           ::BIGINT as dups_kept
  from per_q
)
select threshold, n_kept, bytes_kept, dups_kept,
       ((dups_kept * 1000000) // n_kept)::BIGINT as dup_ppm_kept
from cum
"""


def q_traindata_shard_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducibility checksums per training shard: an ORDER-INDEPENDENT
    content checksum (sum of per-doc md5-32 hashes — commutative, so any
    partitioning/ingest order yields the same value) plus doc and byte
    counts — the manifest row two independent pipeline runs diff to
    prove they built the same shard without comparing payloads. One
    projection + one groupBy; BIGINT headroom to ~2^31 docs/shard."""
    from ..operators.textstats import hash32_col

    d = _t(spark, sf_dir, "documents").select(
        F.pmod(F.col("doc_id"), F.lit(8)).cast("long").alias("shard"),
        "n_chars",
        hash32_col(F.col("text")).alias("h32"),
    )
    return d.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_bytes"),
        F.sum("h32").cast("long").alias("content_checksum"),
    )


SQL_TRAINDATA_SHARD_CHECKSUMS = f"""
with d as (
  select (doc_id % 8)::BIGINT as shard, n_chars,
         {_H32.format(x='text')} as h32
  from documents
)
select shard, count(*)::BIGINT as n_docs, sum(n_chars)::BIGINT as n_bytes,
       sum(h32)::BIGINT as content_checksum
from d group by shard
"""


# --- session-31: temperature sweep, numeric density, shingle DF profile,
#     value pareto ------------------------------------------------------------

#: per-tau sampling weight n^(1/tau) for tau in {1,2,4} — expressed ONLY
#: through identity and sqrt (IEEE-correctly-rounded, bit-stable across
#: engines); pow/ln are banned by the repr() gate. Shared verbatim.
_TAU_W_EXPR = (
    "case when tau = 1 then cast(n_docs as double)"
    " when tau = 2 then sqrt(n_docs)"
    " else sqrt(sqrt(n_docs)) end"
)

#: training budget allocated independently at each temperature
_TAU_BUDGET = 100000


def q_traindata_temperature_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling-temperature sweep: per-domain mixture weights at
    τ ∈ {1,2,4} in one pass — the tuning table behind
    traindata_domain_mix's fixed τ=2 choice (how much does each τ
    flatten the head and boost the tail?). n^(1/τ) is composed from
    sqrt only (τ=4 ⇒ sqrt∘sqrt), so every weight is bit-identical
    across engines; per-τ normalizers sum as DECIMAL(28,12) (exact,
    associative) and shares are floor-projected to ppm. Domains use the
    deliberately Zipf-skewed host synthesis (_BINPACK_HOST_EXPR) so the
    flattening is visible — raw `source` counts are uniform by
    construction and every τ would emit the same row. Shape: one scan →
    bounded domain rollup → 3-row τ grid explode → broadcast of the
    3-row normalizer table; nothing here grows with corpus size except
    the first groupBy (map-side partial)."""
    docs = _t(spark, sf_dir, "documents")
    counts = docs.selectExpr(f"{_BINPACK_HOST_EXPR} as domain").groupBy(
        "domain"
    ).agg(F.count("*").cast("long").alias("n_docs"))
    grid = counts.select(
        "domain",
        "n_docs",
        F.explode(F.expr("array(1L, 2L, 4L)")).alias("tau"),
    )
    w = grid.selectExpr("domain", "tau", "n_docs", f"{_TAU_W_EXPR} as w")
    z = w.groupBy("tau").agg(
        F.sum(F.expr("cast(w as decimal(28,12))")).cast("double").alias("z")
    )
    return w.join(F.broadcast(z), "tau").selectExpr(
        "domain",
        "tau",
        "n_docs",
        "cast(floor(w / z * 1000000.0) as bigint) as weight_ppm",
        f"cast(floor(w / z * {_TAU_BUDGET}.0) as bigint) as target_docs",
    )


SQL_TRAINDATA_TEMPERATURE_SWEEP = f"""
with counts as (
  select {_BINPACK_HOST_EXPR} as domain, count(*)::BIGINT as n_docs
  from documents group by 1
),
grid as (
  select domain, n_docs, unnest([1,2,4]::BIGINT[]) as tau from counts
),
w as (select domain, tau, n_docs, {_TAU_W_EXPR} as w from grid),
z as (
  select tau, sum(cast(w as decimal(28,12)))::DOUBLE as z from w group by tau
)
select domain, tau, n_docs,
       cast(floor(w / z * 1000000.0) as bigint) as weight_ppm,
       cast(floor(w / z * {_TAU_BUDGET}.0) as bigint) as target_docs
from w join z using (tau)
"""


# --- session-37: compression clusters, stationary type mix, shuffle
#     audit ------------------------------------------------------------------


def q_corpus_compression_cluster_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-then-compress layout plan: documents grouped by their
    16-bit simhash band-0 prefix (near-identical texts share it — the
    same signal dedup_simhash buckets on), per cluster the byte mass
    and whether it is a delta-compression candidate (≥2 docs), plus a
    conservative saving estimate (30% of the non-first copies, integer
    arithmetic) — the shard-layout decision that makes zstd dictionary
    compression actually bite on a 100 TB archive: co-locating
    near-dups in the same output file is free at write time and
    compounds forever. Reuses simhash_band_values (one groupBy over
    token votes) + one join to the corpus sizes + one bounded groupBy."""
    corpus = _corpus(spark, sf_dir)
    b0 = dedup.simhash_band_values(corpus).filter(F.col("band") == 0).select(
        "doc_id", "bval"
    )
    sizes = corpus.select(
        "doc_id", F.length("text").cast("long").alias("nb")
    )
    agg = b0.join(sizes, "doc_id").groupBy("bval").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nb").cast("long").alias("n_bytes"),
    )
    return agg.selectExpr(
        "bval",
        "n_docs",
        "n_bytes",
        "cast(case when n_docs >= 2 then 1 else 0 end as bigint)"
        " as delta_candidate",
        "cast(case when n_docs >= 2 then"
        " ((n_docs - 1) * (n_bytes div n_docs) * 3) div 10"
        " else 0 end as bigint) as est_saved_bytes",
    )


def _sql_corpus_compression_cluster_plan() -> str:
    return f"""{_sql_simhash_wide()},
sizes as (select doc_id, length(text)::BIGINT as nb from corpus),
agg as (
  select w.b0 as bval, count(*)::BIGINT as n_docs, sum(s.nb)::BIGINT as n_bytes
  from wide w join sizes s on w.doc_id = s.doc_id
  group by w.b0
)
select bval, n_docs, n_bytes,
       (case when n_docs >= 2 then 1 else 0 end)::BIGINT as delta_candidate,
       (case when n_docs >= 2 then
          ((n_docs - 1) * (n_bytes // n_docs) * 3) // 10
        else 0 end)::BIGINT as est_saved_bytes
from agg
"""


#: shard count for the md5 shuffle audit
_SHUFFLE_SHARDS = 16


def q_traindata_seed_shuffle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-quality audit of the deterministic md5 global shuffle:
    docs land in {_SHUFFLE_SHARDS} hash shards; per shard, is any single
    source over-represented (skew_ppm = max source count ÷ the uniform
    expectation, in ppm)? A training dataloader that streams shards
    sequentially needs every shard to look like the whole corpus — this
    is the check that the hash really mixed the (source-clustered)
    input. md5 is the one cross-engine hash; two bounded groupBys."""
    d = _t(spark, sf_dir, "documents").selectExpr(
        "source",
        "cast(cast(conv(substr(md5(cast(doc_id as varchar(30))), 1, 8),"
        f" 16, 10) as bigint) % {_SHUFFLE_SHARDS} as bigint) as shard",
    )
    cells = d.groupBy("shard", "source").agg(
        F.count("*").cast("long").alias("n")
    )
    return cells.groupBy("shard").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_sources"),
        F.max("n").cast("long").alias("max_source_n"),
    ).selectExpr(
        "shard",
        "n_docs",
        "n_sources",
        "max_source_n",
        "cast((max_source_n * n_sources * cast(1000000 as bigint))"
        " div n_docs as bigint) as skew_ppm",
    )


SQL_TRAINDATA_SEED_SHUFFLE_AUDIT = f"""
with d as (
  select source,
         ((('0x' || substr(md5(cast(doc_id as varchar(30))), 1, 8))::BIGINT)
          % {_SHUFFLE_SHARDS})::BIGINT as shard
  from documents
),
cells as (
  select shard, source, count(*)::BIGINT as n from d group by shard, source
)
select shard, sum(n)::BIGINT as n_docs, count(*)::BIGINT as n_sources,
       max(n)::BIGINT as max_source_n,
       ((max(n) * count(*) * 1000000) // sum(n))::BIGINT as skew_ppm
from cells group by shard
"""


# --- session-38: reservoir sample, phrase mining, bounce rate ---------------

#: fixed per-stratum sample size
_RESERVOIR_K = 10


def q_traindata_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-stratum sample (the distributed reservoir): exactly
    min(K, n) docs per language, chosen uniformly-without-replacement by
    ranking on the md5 key — deterministic, seedable, and
    partition-invariant, where traindata_stratified_sample's Bernoulli
    coin gives only an EXPECTED rate. Shape: two-phase top-k (top-k is a
    semilattice): phase 1 prunes per (lang, physical partition) so no
    task ever sorts a whole language — the per-language global window is
    a one-task funnel at web scale (the r4 fluency lesson) — and phase 2
    ranks the ≤ K·P survivors. md5 is the one cross-engine hash."""
    k = _RESERVOIR_K
    docs = _t(spark, sf_dir, "documents").selectExpr(
        "lang",
        "doc_id",
        "cast(conv(substr(md5(cast(doc_id as varchar(30))), 1, 8), 16, 10)"
        " as bigint) as skey",
    )
    w1 = Window.partitionBy("lang", F.spark_partition_id()).orderBy(
        "skey", "doc_id"
    )
    pruned = docs.withColumn("__rn", F.row_number().over(w1)).filter(
        F.col("__rn") <= k
    )
    w2 = Window.partitionBy("lang").orderBy("skey", "doc_id")
    return (
        pruned.withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= k)
        .select(
            "lang",
            F.col("sample_rank").cast("long").alias("sample_rank"),
            "doc_id",
            "skey",
        )
    )


SQL_TRAINDATA_RESERVOIR_SAMPLE = f"""
with d as (
  select lang, doc_id,
         (('0x' || substr(md5(cast(doc_id as varchar(30))), 1, 8))::BIGINT)
           as skey
  from documents
),
r as (
  select lang, doc_id, skey,
         row_number() over (partition by lang order by skey, doc_id)
           as sample_rank
  from d
)
select lang, sample_rank::BIGINT as sample_rank, doc_id, skey
from r where sample_rank <= {_RESERVOIR_K}
"""


#: training topology for the batch-balance audit
_BATCH_DEVICES = 8


def q_traindata_device_batch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Device batch-balance audit: packed 2048-token sequences assigned
    round-robin to {_BATCH_DEVICES} devices (seq_id arithmetic over the
    scalable prefix-sum packing — no new shuffle semantics, pure
    projection), then per device: sequences, real tokens, and the
    imbalance vs the
    uniform share — the number that decides whether the pack order
    needs length-bucketing before it hits the trainer (stragglers are
    paid at every allreduce). Distinct packed seqs come from ONE
    groupBy of the per-doc assignment."""
    from ..operators.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    packed = pack_sequences(docs, 2048)
    # tokens of a doc land in its FIRST seq for this audit (exact token
    # splitting across seq boundaries is pack_fragmentation's business;
    # the device plan needs conserved totals, which first-seq gives)
    first = packed.selectExpr(
        "cast(seq_id as bigint) as seq", "n_tokens"
    ).groupBy("seq").agg(F.sum("n_tokens").cast("long").alias("seq_tokens"))
    dev = first.selectExpr(
        f"cast(seq % {_BATCH_DEVICES} as bigint) as device",
        "seq_tokens",
    )
    agg = dev.groupBy("device").agg(
        F.count("*").cast("long").alias("n_slots"),
        F.sum("seq_tokens").cast("long").alias("n_tokens"),
    )
    wt = Window.partitionBy()
    return agg.withColumn("__tot", F.sum("n_tokens").over(wt)).selectExpr(
        "device",
        "n_slots",
        "n_tokens",
        f"cast((n_tokens * cast({_BATCH_DEVICES} as bigint)"
        " * cast(1000000 as bigint)) div __tot as bigint)"
        " as load_vs_uniform_ppm",
    )


def _sql_traindata_device_batch_plan() -> str:
    inner = SQL_TRAINDATA_PACK_SEQUENCES
    return f"""
with packed as ({inner}),
first as (
  select seq_id as seq, sum(n_tokens)::BIGINT as seq_tokens
  from packed group by seq_id
)
select (seq % {_BATCH_DEVICES})::BIGINT as device,
       count(*)::BIGINT as n_slots,
       sum(seq_tokens)::BIGINT as n_tokens,
       ((sum(seq_tokens) * {_BATCH_DEVICES} * 1000000)
        // (sum(sum(seq_tokens)) over ()))::BIGINT as load_vs_uniform_ppm
from first group by seq % {_BATCH_DEVICES}
"""


#: validation share: md5 bucket < 20 of 100 => ~20% val split
_SPLIT_VAL_PCT = 20


def q_traindata_split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val split leakage: hash-split the corpus (md5 of doc id,
    {_SPLIT_VAL_PCT}% validation), then count EXACT-duplicate content
    pairs that cross the split — every such pair leaks validation
    signal into training (the intra-corpus complement of
    traindata_decontaminate's external-benchmark n-gram check; random
    splits leak exactly this way when dedup runs after splitting).
    ONE content-hash groupBy (train count × val count per content key
    gives cross pairs in closed form — never a pair self-join), plus
    the corpus-level summary."""
    d = _t(spark, sf_dir, "documents").selectExpr(
        "md5(text) as h",
        "case when cast(conv(substr(md5(cast(doc_id as varchar(30))), 1, 8),"
        f" 16, 10) as bigint) % 100 < {_SPLIT_VAL_PCT} then 1 else 0 end"
        " as is_val",
    )
    per = d.groupBy("h").agg(
        F.sum(F.expr("1 - is_val")).cast("long").alias("n_train"),
        F.sum("is_val").cast("long").alias("n_val"),
    )
    return per.agg(
        F.count("*").cast("long").alias("n_content_keys"),
        F.sum(F.expr("n_train + n_val")).cast("long").alias("n_docs"),
        F.sum("n_val").cast("long").alias("n_val_docs"),
        F.sum(F.expr("n_train * n_val")).cast("long").alias("n_leak_pairs"),
        F.sum(
            F.expr("case when n_train > 0 and n_val > 0 then 1 else 0 end")
        ).cast("long").alias("n_leaky_keys"),
    ).selectExpr(
        "n_content_keys",
        "n_docs",
        "n_val_docs",
        "n_leak_pairs",
        "n_leaky_keys",
        "cast((n_leaky_keys * cast(1000000 as bigint)) div n_content_keys"
        " as bigint) as leaky_key_ppm",
    )


SQL_TRAINDATA_SPLIT_LEAKAGE_CHECK = f"""
with d as (
  select md5(text) as h,
         case when (('0x' || substr(md5(cast(doc_id as varchar(30))), 1, 8))
                    ::BIGINT) % 100 < {_SPLIT_VAL_PCT} then 1 else 0 end
           as is_val
  from documents
),
per as (
  select h, sum(1 - is_val)::BIGINT as n_train, sum(is_val)::BIGINT as n_val
  from d group by h
)
select count(*)::BIGINT as n_content_keys,
       sum(n_train + n_val)::BIGINT as n_docs,
       sum(n_val)::BIGINT as n_val_docs,
       sum(n_train * n_val)::BIGINT as n_leak_pairs,
       sum(case when n_train > 0 and n_val > 0 then 1 else 0 end)::BIGINT
         as n_leaky_keys,
       ((sum(case when n_train > 0 and n_val > 0 then 1 else 0 end)
         * 1000000) // count(*))::BIGINT as leaky_key_ppm
from per
"""


# --- session-53: duplicate discount, WAU overlap, quality drift -------------


def q_traindata_duplicate_discount_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup via duplicate-discount sampling weights: instead of
    dropping copies (dedup_exact's keeper), every copy of a document
    gets weight 1/n_copies — the corpus keeps its support but each
    CONTENT contributes one expected occurrence per epoch (the
    repetition-control alternative when provenance diversity matters).
    Per source: document count, effective document mass Σ 1/n_copies
    (exact integer ppm per doc, summed), and the discount. One content
    groupBy + one join back + one rollup — the dedup_exact plan with a
    weight projection."""
    d = _corpus(spark, sf_dir).selectExpr(
        "doc_id", "md5(text) as h",
        "case when doc_id >= 200000 then 'snapshot'"
        " when doc_id >= 100000 then 'tailcut' else 'base' end as source",
    )
    copies = d.groupBy("h").agg(F.count("*").cast("long").alias("n_copies"))
    j = d.join(copies, "h").selectExpr(
        "source",
        "cast(1000000 div n_copies as bigint) as w_ppm",
    )
    return j.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("w_ppm").cast("long").alias("effective_docs_ppm"),
    ).selectExpr(
        "source",
        "n_docs",
        "effective_docs_ppm",
        "cast((n_docs * cast(1000000 as bigint) - effective_docs_ppm)"
        " div n_docs as bigint) as discount_ppm",
    )


SQL_TRAINDATA_DUPLICATE_DISCOUNT_WEIGHTS = f"""
with corpus as ({CORPUS_SQL}),
d as (
  select doc_id, md5(text) as h,
         case when doc_id >= 200000 then 'snapshot'
              when doc_id >= 100000 then 'tailcut' else 'base' end as source
  from corpus
),
copies as (select h, count(*)::BIGINT as n_copies from d group by h),
j as (
  select d.source, (1000000 // n_copies)::BIGINT as w_ppm
  from d join copies on d.h = copies.h
)
select source, count(*)::BIGINT as n_docs,
       sum(w_ppm)::BIGINT as effective_docs_ppm,
       ((count(*) * 1000000 - sum(w_ppm)) // count(*))::BIGINT
         as discount_ppm
from j group by source
"""


def q_corpus_quality_drift_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-metric drift between crawl epochs: per source, the
    decimal-exact mean quality score in the even-position vs
    odd-position epoch slices (the parity-stripped within-source
    selector — doc_id % 2 is constant per source, the coprime trap)
    and the signed delta in ppm — text_simhash_drift's vocabulary view
    says WHAT changed; this says whether it got better or worse. Means
    go through DECIMAL(18,4) sums (exact, associative) with per-row
    double division + floor."""
    score = quality_score_cols(F.col("text"))["quality_score"]
    d = _t(spark, sf_dir, "documents").select(
        "source",
        F.expr(
            "cast(case when doc_id % 40 - doc_id % 20 = 20"
            " then 1 else 0 end as bigint)"
        ).alias("epoch"),
        score.cast("decimal(18,4)").alias("q"),
    )
    cells = d.groupBy("source", "epoch").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("q").alias("sq"),
    )
    piv = cells.groupBy("source").agg(
        F.max(F.when(F.col("epoch") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("epoch") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("epoch") == 0, F.col("sq"))).alias("s0"),
        F.max(F.when(F.col("epoch") == 1, F.col("sq"))).alias("s1"),
    )
    return piv.selectExpr(
        "source",
        "cast(n0 as bigint) as n_epoch0",
        "cast(n1 as bigint) as n_epoch1",
        "cast(floor(cast(s0 as double) / cast(n0 as double)"
        " * cast(1000000 as double)) as bigint) as q0_ppm",
        "cast(floor(cast(s1 as double) / cast(n1 as double)"
        " * cast(1000000 as double)) as bigint) as q1_ppm",
        "cast(floor(cast(s1 as double) / cast(n1 as double)"
        " * cast(1000000 as double)) as bigint)"
        " - cast(floor(cast(s0 as double) / cast(n0 as double)"
        " * cast(1000000 as double)) as bigint) as drift_ppm",
    )


def _sql_corpus_quality_drift_epochs() -> str:
    return f"""
with {_SQL_QUALITY_M}, scored_src as (
  select dd.source, m.doc_id,
         round({_SQL_QUALITY_SCORE}::DOUBLE, 2) as q
  from m join documents dd on m.doc_id = dd.doc_id
),
d as (
  select source,
         (case when doc_id % 40 - doc_id % 20 = 20 then 1 else 0 end)
           ::BIGINT as epoch,
         q::DECIMAL(18,4) as q
  from scored_src
),
cells as (
  select source, epoch, count(*)::BIGINT as n, sum(q) as sq
  from d group by source, epoch
),
piv as (
  select source,
         max(case when epoch = 0 then n end) as n0,
         max(case when epoch = 1 then n end) as n1,
         max(case when epoch = 0 then sq end) as s0,
         max(case when epoch = 1 then sq end) as s1
  from cells group by source
)
select source, n0::BIGINT as n_epoch0, n1::BIGINT as n_epoch1,
       cast(floor(cast(s0 as double) / cast(n0 as double)
         * cast(1000000 as double)) as bigint) as q0_ppm,
       cast(floor(cast(s1 as double) / cast(n1 as double)
         * cast(1000000 as double)) as bigint) as q1_ppm,
       cast(floor(cast(s1 as double) / cast(n1 as double)
         * cast(1000000 as double)) as bigint)
       - cast(floor(cast(s0 as double) / cast(n0 as double)
         * cast(1000000 as double)) as bigint) as drift_ppm
from piv
"""


# --- session-66: mixture HHI, power-user migration --------------------------


def q_traindata_mixture_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture concentration per sampling temperature: the Herfindahl
    index of each τ's domain weights (Σ share², integer ppm over the
    exact ppm weights the sweep already emits) — the one-number
    diversity readout that closes the temperature story: τ=1 mirrors
    the corpus skew, higher τ provably flattens, and THIS is the
    number a data-mix reviewer compares against the uniform floor
    1/n_domains. Pure rollup over the bounded sweep table."""
    sw = q_traindata_temperature_sweep(spark, sf_dir).select(
        "tau", "weight_ppm"
    )
    return sw.groupBy("tau").agg(
        F.count("*").cast("long").alias("n_domains"),
        F.expr(
            "cast(sum(weight_ppm * weight_ppm) div cast(1000000 as bigint)"
            " as bigint)"
        ).alias("hhi_ppm"),
    ).selectExpr(
        "tau",
        "n_domains",
        "hhi_ppm",
        "cast(cast(1000000 as bigint) div n_domains as bigint)"
        " as uniform_floor_ppm",
    )


def _sql_traindata_mixture_hhi() -> str:
    return f"""
with sw as (select tau, weight_ppm from ({SQL_TRAINDATA_TEMPERATURE_SWEEP}))
select tau, count(*)::BIGINT as n_domains,
       (sum(weight_ppm * weight_ppm) // 1000000)::BIGINT as hhi_ppm,
       (1000000 // count(*))::BIGINT as uniform_floor_ppm
from sw group by tau
"""
