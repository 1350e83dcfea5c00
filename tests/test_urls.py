"""Canonicalization: Spark column impl == pure-Python twin; idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from openreviewcrawler_spark.functions.urls import (
    canonicalize_col,
    canonicalize_url,
    host_col,
    host_of,
    merge_invitation,
    merge_invitations_col,
    path_of,
)

DIRTY = [
    "HTTPS://Host0001.Example:443/p/1",
    "http://h.example:80/a/b?q=1#frag",
    "https://h.example/p/%7Euser/%41%62c",
    "https://h.example",
    "https://h.example?q=2",
    "https://h.example/p/%2Fkeep-reserved%2f",
    "http://H.EXAMPLE:8080/x",
    "not-a-url",
    "https://h.example/p/5#a#b",
    "ftp://Mixed.Case/Path",
    "https://h.example/p/%7e/%2d%2E%5F",
    # ADVICE r1 regression vectors: scheme-less input WITH a fragment must
    # fall back to the fragment-stripped string in both implementations, and
    # escape spellings *created by decoding* must not be re-decoded
    # ('%2%65' holds one valid escape '%65'->'e'; the resulting '%2e' stays).
    "notaurl#frag",
    "https://a.example/x%2%6534",
    # ADVICE r2 regression vector: a newline after '#' — the vectorized strip
    # must truncate at the FIRST '#' like url.find('#') does, not stop the
    # regex at the newline (default '.' semantics kept the fragment and the
    # raw string passed through the scheme-match fallback).
    "https://h.example/p#frag\nmore",
    "noscheme#a\nb",
]

EXPECTED = {
    "HTTPS://Host0001.Example:443/p/1": "https://host0001.example/p/1",
    "http://h.example:80/a/b?q=1#frag": "http://h.example/a/b?q=1",
    "https://h.example/p/%7Euser/%41%62c": "https://h.example/p/~user/Abc",
    "https://h.example": "https://h.example/",
    "https://h.example/p/%2Fkeep-reserved%2f": "https://h.example/p/%2Fkeep-reserved%2f",
    "http://H.EXAMPLE:8080/x": "http://h.example:8080/x",
    "not-a-url": "not-a-url",
    "https://h.example/p/5#a#b": "https://h.example/p/5",
    "ftp://Mixed.Case/Path": "ftp://mixed.case/Path",
    "https://h.example/p/%7e/%2d%2E%5F": "https://h.example/p/~/-._",
    "notaurl#frag": "notaurl",
    "https://a.example/x%2%6534": "https://a.example/x%2e34",
    "https://h.example/p#frag\nmore": "https://h.example/p",
    "noscheme#a\nb": "noscheme",
}


def test_python_canonicalize_expected():
    for dirty, want in EXPECTED.items():
        assert canonicalize_url(dirty) == want, dirty


def test_spark_matches_python(spark):
    df = spark.createDataFrame([(u,) for u in DIRTY], ["url"])
    rows = df.select("url", canonicalize_col(F.col("url")).alias("c")).collect()
    for r in rows:
        assert r["c"] == canonicalize_url(r["url"]), r["url"]


def test_idempotent():
    for u in DIRTY:
        if u == "https://a.example/x%2%6534":
            # malformed dangling escape: single-pass decode is intentionally
            # NOT idempotent here ('%2' + '65'->'e' forms a new '%2e'); the
            # contract is engine == oracle twin, both single-pass.
            continue
        c = canonicalize_url(u)
        assert canonicalize_url(c) == c, u


def test_host_and_path(spark):
    canon = "https://host0001.example/p/1?q=2"
    assert host_of(canon) == "host0001.example"
    assert path_of(canon) == "/p/1?q=2"
    df = spark.createDataFrame([(canon,)], ["u"])
    row = df.select(host_col(F.col("u")).alias("h")).collect()[0]
    assert row["h"] == "host0001.example"


def test_merge_invitations(spark):
    """Reference semantics check (/root/reference/crawler.py:147-158)."""
    invs = [
        "V.cc/2019/Conference/-/Paper123/Official_Review",
        "V.cc/2019/Conference/-/paper7/Decision",
        "V.cc/2019/Conference/-/Paper/42/Meta_Review",
        "V.cc/2019/Conference/-/Blind_Submission",
    ]
    want = {
        "V.cc/2019/Conference/-/Paper.*/Official_Review",
        "V.cc/2019/Conference/-/paper.*/Decision",
        "V.cc/2019/Conference/-/Paper/.*/Meta_Review",
        "V.cc/2019/Conference/-/Blind_Submission",
    }
    assert {merge_invitation(i) for i in invs} == want
    df = spark.createDataFrame([(i,) for i in invs], ["inv"])
    got = {
        r["m"]
        for r in df.select(merge_invitations_col(F.col("inv")).alias("m")).distinct().collect()
    }
    assert got == want
