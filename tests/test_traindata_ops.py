"""Training-data pipeline operators: dedup family, similarity search, text
stats, multimodal plumbing — plus a sampled catalog-vs-DuckDB oracle gate
(the same comparison the driver runs at sf0.01, here at sf0.001 on a fast
subset; scripts/check_oracle.py covers the full catalog)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from openreviewcrawler_spark.operators import dedup, multimodal, similarity
from openreviewcrawler_spark.operators.textstats import (
    fingerprint_cols,
    lang_id_col,
    tokens_col,
)

DOCS = [
    # (doc_id, text, lang)
    (0, "the quick brown fox jumps over the lazy dog again and again today", "en"),
    (1, "the quick brown fox jumps over the lazy dog again and again today", "en"),  # exact dup of 0
    (2, "quick brown fox jumps over the lazy dog again and again today", "en"),  # near dup (first token dropped)
    (3, "completely different content about spark shuffles and partitions here", "en"),
    (4, "der hund und die katze und das pferd sind nicht da heute", "de"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def test_dedup_exact_groups(corpus):
    g = (
        corpus.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n"))
        .filter("n > 1")
        .collect()
    )
    assert len(g) == 1 and g[0]["keeper"] == 0 and g[0]["n"] == 2


def test_minhash_lsh_finds_exact_and_near_dups(corpus):
    pairs = {(r["doc_a"], r["doc_b"]) for r in dedup.minhash_lsh_pairs(corpus).collect()}
    assert (0, 1) in pairs  # exact dup shares all bands
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup shares >=1 band
    assert not any(3 in p for p in pairs)  # unrelated doc never pairs


def test_minhash_signature_identical_for_exact_dup(corpus):
    sig = {r["doc_id"]: tuple(r[f"mh{j}"] for j in range(dedup.N_MINHASH))
           for r in dedup.minhash_signatures(corpus).collect()}
    assert sig[0] == sig[1]
    # near dup agrees on most hashes (shares most shingles)
    agree = sum(a == b for a, b in zip(sig[0], sig[2]))
    assert agree >= dedup.N_MINHASH // 2


def test_simhash_near_pairs(corpus):
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in dedup.simhash_near_pairs(corpus, max_hamming=dedup.SIMHASH_BITS).collect()}
    assert pairs[(0, 1)] == 0  # identical text -> identical signature
    assert pairs[(0, 2)] <= 4  # near dup -> small hamming
    assert pairs[(0, 3)] > pairs[(0, 2)]  # unrelated is farther


def test_ngram_jaccard_exact(corpus):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(corpus, threshold=0.0).collect()}
    assert pairs[(0, 1)] == 1.0
    assert 0.5 < pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs  # no shared shingles at all


def test_embedding_near_dups_and_ann(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [1.0, 0.0, 0.0, 0.0], 0),      # exact dup of 0
        (2, [0.9, 0.1, 0.0, 0.0], 0),      # near
        (3, [0.0, 1.0, 0.0, 0.0], 0),      # orthogonal
        (4, [0.0, 0.0, 1.0, 0.0], 1),      # other cell
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>, label int")
    near = {(r["vec_a"], r["vec_b"]) for r in dedup.embedding_near_pairs(df, 0.95).collect()}
    assert (0, 1) in near and (0, 3) not in near

    top = similarity.brute_topk(df, n_queries=1, k=2).collect()
    assert [r["cand_id"] for r in sorted(top, key=lambda r: r["rank"])] == [1, 2]

    ivf = similarity.ivf_topk(df, n_queries=1, k=4).collect()
    assert all(r["cand_id"] != 4 for r in ivf)  # other cell never probed

    sig = {r["vec_id"]: r["sig"] for r in similarity.lsh_signatures(df).collect()}
    assert sig[0] == sig[1]  # identical vectors -> identical signature


def test_lang_id_and_fingerprint(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    pred = {r["doc_id"]: r["p"] for r in df.select(
        "doc_id", lang_id_col(tokens_col(F.col("text"))).alias("p")).collect()}
    assert pred[0] == "en" and pred[4] == "de"

    fps = df.select("doc_id", *[c.alias(k) for k, c in fingerprint_cols(F.col("text")).items()])
    rows = {r["doc_id"]: (r["fp_md5"], r["fp_roll"]) for r in fps.collect()}
    assert rows[0] == rows[1]          # dup text -> same fingerprints
    assert rows[0] != rows[2]
    assert 0 <= rows[0][1] < 2147483647


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    assets = multimodal.assets_from_documents(docs)
    meta = {r["asset_id"]: r for r in multimodal.decode_metadata(assets).collect()}
    for d, text, _l in DOCS:
        assert meta[d]["n_bytes"] == len(text.encode())
        assert meta[d]["width"] == len(text.encode()) % 640 + 1
        assert meta[d]["height"] == text.encode()[0] + 1
    frames = multimodal.sample_frames(assets).collect()
    vids = [d for d, _t, _l in DOCS if d % 3 == 2]
    assert {r["asset_id"] for r in frames} == set(vids)
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r["asset_id"], []).append(r)
    for aid, fr in by_asset.items():
        assert sorted(f["frame_idx"] for f in fr) == [0, 1, 2]
        n = [len(t.encode()) for d, t, _l in DOCS if d == aid][0]
        assert all(f["frame_len"] == n // 3 for f in fr)
        assert all(len(bytes(f["frame_bytes"])) == f["frame_len"] for f in fr)


# --- sampled cross-engine oracle gate ---------------------------------------

ORACLE_SUBSET = [
    "crawl_round",
    "crawl_fetch_seq",
    "dedup_minhash_lsh",
    "doc_fingerprint",
    "reply_forest",
    "label_cascade",
    "q1_pricing",
    "ann_ivf_topk",
]


def _norm(v):
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


@pytest.mark.parametrize("name", ORACLE_SUBSET)
def test_catalog_matches_duckdb(spark, sf_dir, name):
    from openreviewcrawler_spark.catalog import CATALOG

    qd = CATALOG[name]
    sdf = qd.build(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    res = con.execute(qd.sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols)
    assert len(srows) == len(drows)
    s_ord = sorted(range(len(scols)), key=lambda i: scols[i])
    d_ord = sorted(range(len(dcols)), key=lambda i: dcols[i])
    sm = sorted(tuple(_norm(r[i]) for i in s_ord) for r in srows)
    dm = sorted(tuple(_norm(r[i]) for i in d_ord) for r in drows)
    assert sm == dm
