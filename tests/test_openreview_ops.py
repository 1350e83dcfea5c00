"""Label / forest / rollup / flatten parity: distributed engine vs the
reference-style nested-dict oracle, on the golden file + branch-complete
synthetic fixture."""

from __future__ import annotations

import copy
import json

import pytest

from openreviewcrawler_spark.operators.comment_tree import (
    reply_forest,
    reply_forest_global,
)
from openreviewcrawler_spark.operators.flatten import flatten_all
from openreviewcrawler_spark.operators.labeling import label_submissions
from openreviewcrawler_spark.operators.stats import venue_year_rollup
from openreviewcrawler_spark.oracle.reference_oracle import (
    forest_edges,
    label_nested,
    rollup_nested,
)
from openreviewcrawler_spark.sources.openreview_json import (
    gen_notes_fixture,
    nested_to_spark,
)

GOLDEN = "/root/reference/example_output.json"


@pytest.fixture(scope="module", params=["golden", "synthetic"])
def nested(request):
    if request.param == "golden":
        with open(GOLDEN) as fh:
            return json.load(fh)
    return gen_notes_fixture()


@pytest.fixture(scope="module")
def tables(spark, nested):
    return nested_to_spark(spark, nested)


def test_labeling_matches_oracle(tables, nested):
    labeled = label_submissions(tables["submissions"], tables["notes"])
    got = {r["id"]: r["acceptance_tag"] for r in labeled.select("id", "acceptance_tag").collect()}

    oracle_data = copy.deepcopy(nested)
    label_nested(oracle_data)
    want = {
        s["id"]: s["acceptance_tag"]
        for vy in oracle_data
        for s in vy["submissions"]
    }
    assert got == want
    if len(want) > 20:  # synthetic fixture exercises every label
        assert set(want.values()) == {"accepted", "rejected", "withdrawn", "unknown"}


def test_forest_matches_oracle(tables, nested):
    edges = reply_forest(tables["notes"])
    got = {}
    for r in edges.collect():
        got.setdefault(r["forum"], set()).add(
            (r["id"], r["parent_id"], r["root_id"], r["depth"])
        )
    want = {}
    for vy in nested:
        for s in vy["submissions"]:
            e = forest_edges(s["forum"], s["notes"])
            if e:
                want[s["forum"]] = e
    assert got == want

    got_global = {}
    for r in reply_forest_global(tables["notes"]).collect():
        got_global.setdefault(r["forum"], set()).add(
            (r["id"], r["parent_id"], r["root_id"], r["depth"])
        )
    assert got_global == want


def test_rollup_matches_oracle(tables, nested):
    labeled = label_submissions(tables["submissions"], tables["notes"])
    roll = venue_year_rollup(labeled, tables["notes"])
    got = {
        (r["venue"], r["year"]): r.asDict()
        for r in roll.collect()
    }
    oracle_data = copy.deepcopy(nested)
    label_nested(oracle_data)
    want = rollup_nested(oracle_data)
    assert set(got) == set(want)
    for key, w in want.items():
        g = got[key]
        assert g["sub"] == w["sub"], key
        for lab in ("accepted", "rejected", "withdrawn", "unknown"):
            assert g[lab] == w[lab], (key, lab)
        for t in ("review", "plain_comment", "decision", "other"):
            assert g[t] == w[t], (key, t)
        assert g["comments_per_submission"] == w["comments_per_submission"], key


def test_flatten_shapes_and_bug_parity(spark):
    nested = gen_notes_fixture()
    tables = nested_to_spark(spark, nested)
    labeled = label_submissions(tables["submissions"], tables["notes"])
    flat = flatten_all(
        tables["venues"], labeled, tables["revisions"], tables["notes"],
        tables["note_revisions"],
    )
    subs = flat["submission"].collect()
    assert len(subs) == sum(len(v["submissions"]) for v in nested)
    by_id = {r["id"]: r for r in subs}
    for vy in nested:
        for s in vy["submissions"]:
            r = by_id[s["id"]]
            authors = s["content"].get("authors", [])
            # truncate-at-12 pivot; 13th model column always NULL
            for i in range(12):
                want = authors[i] if i < len(authors) else None
                assert r[f"author{i}"] == want, (s["id"], i)
            assert r["author12"] is None
            # replyto bug-parity: content never holds 'replyto' -> ""
            assert r["replyto"] == ""
            assert r["title"] == s["content"].get("title", "")
            assert json.loads(r["submission_content"]) == s["content"]
    # note_revision.note_content = PARENT note's content (database.py:186)
    note_content = {r["id"]: r["note_content"] for r in flat["notes"].collect()}
    nrs = flat["note_revision"].collect()
    assert nrs
    for r in nrs:
        assert r["note_content"] == note_content[r["submission"]]
    # venue table: year stringified
    vrow = flat["venue"].collect()[0]
    assert isinstance(vrow["year"], str)


def test_pdf_rewrite_and_refs_drop_original(spark):
    """P10 + O1 refs[1:] parity (/root/reference/crawler.py:86-94,116-117,
    132-133): raw references include the note itself at position 0; for
    pdf-eligible submissions every output pdf points at the local layout."""
    from pyspark.sql import functions as F

    from openreviewcrawler_spark.operators.flatten import (
        drop_original_refs,
        flatten_submissions,
        rewrite_pdf_paths,
    )

    nested = gen_notes_fixture()
    tables = nested_to_spark(spark, nested)
    subs = tables["submissions"]
    # reconstruct RAW refs lists: original (the submission itself, position
    # 0) + the fixture's revisions shifted to positions 1..k. Originals of
    # even-numbered submissions carry a remote pdf -> eligible; odd don't.
    originals = subs.select(
        "venue_id", "venue", "year",
        F.col("id").alias("parent_id"),
        F.lit(0).alias("rec_order"),
        "id", "forum", "replyto", "invitation", "original", "referent",
        "number", "cdate", "tcdate", "tmdate", "ddate", "reply_count",
        F.when(
            F.col("number") % 2 == 0,
            F.map_concat(
                F.col("content"),
                F.create_map(
                    F.lit("pdf"),
                    F.concat(F.lit("https://openreview.net/pdf?id="), F.col("id")),
                ),
            ),
        ).otherwise(F.col("content")).alias("content"),
        "content_lists", "content_json",
    )
    revs_shifted = tables["revisions"].withColumn(
        "rec_order", F.col("rec_order") + 1
    )
    raw_refs = originals.unionByName(revs_shifted)

    # refs[1:]: originals dropped, revision raw positions preserved
    dropped = drop_original_refs(raw_refs)
    assert dropped.filter(F.col("rec_order") == 0).count() == 0
    assert dropped.count() == tables["revisions"].count()

    new_subs, new_revs = rewrite_pdf_paths(subs, raw_refs)
    sub_rows = {r["id"]: r for r in new_subs.collect()}
    rev_rows = new_revs.collect()
    eligible = {
        r["id"] for r in originals.filter(
            F.map_contains_key("content", "pdf")).collect()
    }
    assert eligible  # fixture produces both branches
    for sid, r in sub_rows.items():
        if sid in eligible:
            assert r["content"]["pdf"] == f"/pdf/{sid}_0.pdf"
            assert json.loads(r["content_json"])["pdf"] == f"/pdf/{sid}_0.pdf"
        else:
            assert "pdf" not in r["content"]
    for r in rev_rows:
        if r["parent_id"] in eligible:
            want = f"/pdf/{r['parent_id']}_{r['rec_order']}.pdf"
            assert r["content"]["pdf"] == want
            assert json.loads(r["content_json"])["pdf"] == want

    # the rewritten path reaches the flattened SQL model as pdf_ref
    flat = {r["id"]: r for r in flatten_submissions(new_subs).collect()}
    for sid in eligible:
        assert flat[sid]["pdf_ref"] == f"/pdf/{sid}_0.pdf"


def test_pdf_binary_column(spark):
    """S11 pdf_binary parity (database_model.py:62 LargeBinary): the blob of
    a fetched pdf lands on the submission/revision row; unfetched rows carry
    NULL (the reference's timeout hole, README.md:159-162)."""
    from pyspark.sql import functions as F

    from openreviewcrawler_spark.operators.flatten import flatten_submissions

    nested = gen_notes_fixture()
    tables = nested_to_spark(spark, nested)
    subs = tables["submissions"]
    some_ids = [r["id"] for r in subs.limit(3).collect()]
    blobs = spark.createDataFrame(
        [(i, f"%PDF-{i}".encode()) for i in some_ids],
        "note_id string, pdf_binary binary",
    )
    flat = {r["id"]: r for r in flatten_submissions(subs, blobs).collect()}
    for i in some_ids:
        assert bytes(flat[i]["pdf_binary"]) == f"%PDF-{i}".encode()
    n_null = sum(1 for r in flat.values() if r["pdf_binary"] is None)
    assert n_null == len(flat) - len(some_ids)
    # default: schema keeps the column, all NULL
    flat0 = flatten_submissions(subs).collect()[0]
    assert "pdf_binary" in flat0.asDict() and flat0["pdf_binary"] is None


def test_attach_notes_surfaces_orphans(spark):
    """J2 (crawler.py:104-108): notes whose forum has no submission are
    separated and counted, never silently lost."""
    from openreviewcrawler_spark.operators.stats import (
        attach_notes_with_misses,
        orphan_metrics,
    )

    subs = spark.createDataFrame([("S1",), ("S2",)], "id string")
    notes = spark.createDataFrame(
        [("N1", "S1"), ("N2", "S1"), ("N3", "S2"), ("N4", "GONE"), ("N5", "GONE")],
        "id string, forum string",
    )
    attached, orphans = attach_notes_with_misses(subs, notes)
    assert attached.count() + orphans.count() == notes.count()
    assert {r["id"] for r in orphans.collect()} == {"N4", "N5"}
    m = orphan_metrics(orphans).collect()
    assert len(m) == 1 and m[0]["forum"] == "GONE" and m[0]["n_orphans"] == 2
    assert m[0]["first_orphan_id"] == "N4"
