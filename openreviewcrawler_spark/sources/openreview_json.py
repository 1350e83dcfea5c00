"""Ingest crawler-output-shaped nested JSON into flat Spark DataFrames.

The reference's primary data model is a nested JSON array of venue-year
objects with submissions -> {notes, revisions} (/root/reference/crawler.py:109,
example_output.json). Spark-idiomatic normalization: flat DataFrames keyed by
(forum, referent, replyto), nesting reconstructed on demand with
``collect_list(struct(...))`` (SURVEY.md §1.3).

``content`` is kept three ways:
  * ``content``        map<string,string>        — scalar values, queryable,
  * ``content_lists``  map<string,array<string>> — list values (authors...),
  * ``content_json``   string                    — full dict, **key order
    preserved** (the reference's labeling cascade iterates dict insertion
    order, acceptance_labeling.py:57; Spark maps don't guarantee order).

Also provides the deterministic synthetic nested fixture exercising every
labeling / tree / flatten branch (FIXTURES.md §5).
"""

from __future__ import annotations

import json
import random
from typing import Any

from pyspark.sql import DataFrame, SparkSession

NOTE_FIELDS = ("id", "forum", "replyto", "invitation", "original", "referent")
DATE_FIELDS = ("cdate", "tcdate", "tmdate", "ddate")

_RECORD_SCHEMA = (
    "venue_id int, venue string, year int, parent_id string, rec_order int,"
    " id string, forum string, replyto string, invitation string,"
    " original string, referent string, number int,"
    " cdate long, tcdate long, tmdate long, ddate long, reply_count int,"
    " content map<string,string>, content_lists map<string,array<string>>,"
    " content_json string"
)

VENUES_SCHEMA = "venue_id int, venue string, year int"


def _note_row(
    n: dict, venue_id: int, venue: str, year: int, parent_id: str | None, order: int
) -> dict:
    content = n.get("content") or {}
    scalars = {k: str(v) for k, v in content.items() if not isinstance(v, (list, dict))}
    lists = {
        k: [str(x) for x in v] for k, v in content.items() if isinstance(v, list)
    }
    details = n.get("details") or {}
    return {
        "venue_id": venue_id,
        "venue": venue,
        "year": year,
        "parent_id": parent_id,
        "rec_order": order,
        "id": n.get("id"),
        "forum": n.get("forum"),
        "replyto": n.get("replyto"),
        "invitation": n.get("invitation"),
        "original": n.get("original"),
        "referent": n.get("referent"),
        "number": n.get("number"),
        "cdate": n.get("cdate"),
        "tcdate": n.get("tcdate"),
        "tmdate": n.get("tmdate"),
        "ddate": n.get("ddate"),
        "reply_count": details.get("replyCount"),
        "content": scalars,
        "content_lists": lists,
        "content_json": json.dumps(content, ensure_ascii=False),
    }


def flatten_nested(data: list[dict]) -> dict[str, list[dict]]:
    """Nested venue-year array -> flat row lists (pure Python, driver-side;
    the golden file is small. At scale the same shape arrives as line-JSON
    and goes through spark.read.json + explode instead)."""
    venues, submissions, notes, revisions, note_revisions = [], [], [], [], []
    next_id = 0
    seen_ids: dict[tuple, int] = {}
    for v in data:
        key = (v["venue"], v["year"])
        if "venue_id" in v:
            vid = v["venue_id"]
        elif key in seen_ids:
            vid = seen_ids[key]
        else:
            while next_id in seen_ids.values():
                next_id += 1
            vid = next_id
        seen_ids[key] = vid
        venues.append({"venue_id": vid, "venue": v["venue"], "year": v["year"]})
        for s in v.get("submissions", []):
            submissions.append(_note_row(s, vid, v["venue"], v["year"], None, len(submissions)))
            for i, r in enumerate(s.get("revisions", [])):
                revisions.append(_note_row(r, vid, v["venue"], v["year"], s["id"], i))
            for i, n in enumerate(s.get("notes", [])):
                notes.append(_note_row(n, vid, v["venue"], v["year"], s["id"], i))
                for k, nr in enumerate(n.get("revisions", [])):
                    note_revisions.append(
                        _note_row(nr, vid, v["venue"], v["year"], n["id"], k)
                    )
    return {
        "venues": venues,
        "submissions": submissions,
        "notes": notes,
        "revisions": revisions,
        "note_revisions": note_revisions,
    }


def nested_to_spark(spark: SparkSession, data: list[dict]) -> dict[str, DataFrame]:
    flat = flatten_nested(data)
    out = {"venues": spark.createDataFrame(flat["venues"], VENUES_SCHEMA)}
    for name in ("submissions", "notes", "revisions", "note_revisions"):
        rows = flat[name]
        out[name] = spark.createDataFrame(rows, _RECORD_SCHEMA)
    return out


def load_crawl_json(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    with open(path) as fh:
        return nested_to_spark(spark, json.load(fh))


# ---------------------------------------------------------------------------
# synthetic nested fixture — every labeling/tree branch (FIXTURES.md §5)
# ---------------------------------------------------------------------------

_DECISION_VALUES = [
    "Accept (Poster)",
    "Reject",
    "Accepted and Rejected",  # both words -> unknown
    "Poster presentation",  # neither word -> accepted (except ICLR.cc 2014)
]
_RECOMMENDATIONS = ["Accept", "Reject", "Borderline", None]  # None -> KeyError path


def _mk_note(nid: str, forum: str, replyto: str | None, invitation: str, content: dict,
             ts: int, number: int, referent: str | None = None) -> dict:
    return {
        "id": nid,
        "forum": forum,
        "replyto": replyto,
        "invitation": invitation,
        "content": content,
        "cdate": ts,
        "tcdate": ts,
        "tmdate": ts + 1000,
        "ddate": None,
        "original": None,
        "referent": referent,
        "number": number,
        "details": {"replyCount": 0},
    }


def gen_notes_fixture(seed: int = 42, n_venues: int = 12, subs_per_venue: int = 8) -> list[dict]:
    rng = random.Random(seed)
    data = []
    ts0 = 1_500_000_000_000
    uid = 0

    def new_id(prefix: str) -> str:
        nonlocal uid
        uid += 1
        return f"{prefix}{uid:05d}"

    for vi in range(n_venues):
        venue = "ICLR.cc" if vi % 4 == 0 else f"Conf{vi}.org"
        year = 2014 if vi == 0 else 2016 + vi % 6
        subs = []
        for si in range(subs_per_venue):
            sid = new_id("S")
            branch = (vi * subs_per_venue + si) % 10
            inv = f"{venue}/{year}/Conference/-/Paper{si}/Blind_Submission"
            content: dict[str, Any] = {
                "title": f"Title {sid}",
                "abstract": f"Abstract of {sid} " + "x" * rng.randint(0, 40),
                "authors": [f"Author {j}" for j in range(rng.choice([1, 3, 13, 15]))],
                "authorids": [f"~a{j}_{si}" for j in range(rng.choice([1, 3, 13, 15]))],
                "keywords": ["k1", "k2"],
                "paperhash": f"hash|{sid}",
            }
            if branch == 0:
                inv = f"{venue}/{year}/Conference/-/Paper{si}/Withdrawn_Submission"
            elif branch == 1:
                content["decision"] = rng.choice(_DECISION_VALUES)
            notes = []
            ts = ts0 + si * 10_000
            if branch == 2:
                notes.append(_mk_note(new_id("N"), sid, sid,
                                      f"{venue}/{year}/-/Paper{si}/Desk_Reject",
                                      {"title": "desk reject"}, ts, 1))
            if branch in (3, 4, 5):
                keyname = rng.choice(["decision", "Acceptance Decision", "final decision"])
                c = {"title": "Decision"}
                c[keyname] = rng.choice(_DECISION_VALUES)
                if branch == 4:  # two decision-ish keys: later write wins
                    c["decision2 decision"] = rng.choice(_DECISION_VALUES)
                if branch == 5:  # decision note with NO decision key -> break, unset
                    c = {"title": "Decision", "comment": "no verdict here"}
                notes.append(_mk_note(new_id("N"), sid, sid,
                                      f"{venue}/{year}/-/Paper{si}/Decision", c, ts + 1, 2))
            if branch == 6:
                rec = rng.choice(_RECOMMENDATIONS)
                c = {"title": "Meta Review"}
                if rec is not None:
                    c["recommendation"] = rec
                notes.append(_mk_note(new_id("N"), sid, sid,
                                      f"{venue}/{year}/-/Paper{si}/Meta_Review", c, ts + 2, 3))
            if branch == 7:  # meta then decision: decision overwrites meta verdict
                notes.append(_mk_note(new_id("N"), sid, sid,
                                      f"{venue}/{year}/-/Paper{si}/Meta_Review",
                                      {"recommendation": "Reject"}, ts + 3, 4))
                notes.append(_mk_note(new_id("N"), sid, sid,
                                      f"{venue}/{year}/-/Paper{si}/Decision",
                                      {"decision": "Accept (Oral)"}, ts + 4, 5))
            # reviews/comments + reply chains on every submission
            n_rev = rng.randint(0, 3)
            prev = sid
            for ri in range(n_rev):
                rid = new_id("N")
                review = _mk_note(rid, sid, prev if ri else sid,
                                  f"{venue}/{year}/-/Paper{si}/Official_Review",
                                  {"title": f"R{ri}", "review": "text",
                                   "rating": "7: Good", "confidence": "4"},
                                  ts + 10 + ri, 10 + ri)
                if rng.random() < 0.3:  # note revisions (note_revision table)
                    review["revisions"] = [
                        _mk_note(new_id("NR"), sid, review["replyto"],
                                 review["invitation"],
                                 {"title": f"R{ri} v2", "review": "edited"},
                                 ts + 15 + ri, 10 + ri, referent=rid)
                    ]
                notes.append(review)
                prev = rid
            if rng.random() < 0.4:  # plain comment replying to a review or forum
                notes.append(_mk_note(new_id("N"), sid, prev,
                                      f"{venue}/{year}/-/Paper{si}/Official_Comment",
                                      {"comment": "interesting"}, ts + 20, 20))
            if rng.random() < 0.3:  # lone leaf: replyto a nonexistent id -> dropped by tree
                notes.append(_mk_note(new_id("N"), sid, "MISSING_" + sid,
                                      f"{venue}/{year}/-/Paper{si}/Official_Comment",
                                      {"comment": "orphan"}, ts + 30, 30))
            revisions = []
            for ri in range(rng.randint(0, 2)):
                revisions.append(_mk_note(new_id("R"), sid, None,
                                          f"{venue}/{year}/-/Paper{si}/Revision",
                                          {"title": f"Title {sid} v{ri}", "pdf": f"/pdf/{sid}_{ri}.pdf",
                                           "authors": ["Author 0"], "authorids": [f"~a0_{si}"]},
                                          ts + 40 + ri, 40 + ri, referent=sid))
            sub = _mk_note(sid, sid, None, inv, content, ts, si)
            sub["notes"] = notes
            sub["revisions"] = revisions
            subs.append(sub)
        data.append({"venue_id": vi, "venue": venue, "year": year, "submissions": subs})
    return data


def list_venues(groups: "DataFrame"):
    """S9 venue listing (/root/reference/crawler.py:219-230
    ``get_all_available_venues`` -> ``openreview.tools.get_all_venues``: the
    members of the root "venues" group), distributed: filter the group table
    to the venues group, explode the membership array, distinct.

    ``groups``: (group_id string, members array<string>) — the shape the
    OpenReview groups endpoint returns. Output: one ``venue`` column, the
    exact list the reference prints for --help_venues."""
    from pyspark.sql import functions as F

    return (
        groups.filter(F.col("group_id") == "venues")
        .select(F.explode("members").alias("venue"))
        .distinct()
    )
