"""Acceptance labeling — the reference's classify pass (P6), distributed.

Semantics: acceptance_labeling.py:10-96 — an *ordered* rule cascade per
submission over its notes list, with early-break on decision notes and
insertion-order iteration over content keys. The ordered-scan-with-break over
a variable-length notes array is not expressible with columnar ``when``
chains without losing the overwrite order, so the cascade runs inside one
vectorized pandas UDF over ``collect_list(struct(...))`` per submission —
Arrow-batched, order-preserving (the sanctioned parse-stage UDF; SURVEY.md
§2.10). Everything around it (note packing, joins) is declarative.

The engine's cascade below is an independent implementation from the oracle
(oracle/reference_oracle.py mutates nested dicts reference-style); their
agreement on the branch-complete fixture is the correctness gate.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LABELS = ("accepted", "rejected", "withdrawn", "unknown")


def _verdict(text: str) -> str:
    """accept/reject word logic shared by rules 2 and 3 (lines 26-43, 60-73)."""
    t = text.lower()
    has_r, has_a = "reject" in t, "accept" in t
    if has_r and has_a:
        return "unknown"
    if has_r:
        return "rejected"
    if has_a:
        return "accepted"
    return "accepted"  # not-rejected => accepted (caller handles ICLR.cc 2014)


def label_row(
    sub_invitation: str,
    sub_content_json: str,
    venue: str,
    year: int,
    notes: list[tuple[str, str]],
) -> str:
    """The cascade for one submission. ``notes`` = ordered (invitation,
    content_json) pairs. Returns one of LABELS."""
    if "withdraw" in (sub_invitation or "").lower():
        return "withdrawn"
    content = json.loads(sub_content_json) if sub_content_json else {}
    tag: str | None = None
    if "decision" in content:
        tag = _verdict(str(content["decision"]))
        if (
            tag == "accepted"
            and "accept" not in str(content["decision"]).lower()
            and venue == "ICLR.cc"
            and year == 2014
        ):
            tag = "unknown"
        return tag
    for inv, cj in notes:
        invl = (inv or "").lower()
        if "desk_reject" in invl:
            tag = "rejected"
        if "decision" in invl or "acceptance" in invl:
            note_content = json.loads(cj) if cj else {}
            for key in note_content:  # dict insertion order == JSON order
                if "decision" in key.lower():
                    tag = _verdict(str(note_content[key]))
            break
        elif "meta" in invl:
            note_content = json.loads(cj) if cj else {}
            if "recommendation" in note_content:
                rec = str(note_content["recommendation"]).lower()
                if "reject" in rec:
                    tag = "rejected"
                elif "accept" in rec:
                    tag = "accepted"
                else:
                    tag = "unknown"
            else:
                tag = "unknown"
    return tag if tag is not None else "unknown"


def label_submissions(submissions: DataFrame, notes: DataFrame) -> DataFrame:
    """Returns submissions + ``acceptance_tag``.

    Plan: pack each submission's notes in crawl order with
    ``sort_array(collect_list(struct(rec_order, invitation, content_json)))``
    (one shuffle on submission id), left-join onto submissions (submission
    side unchanged), evaluate the cascade in a single Arrow batch UDF.
    """
    packed = notes.groupBy("parent_id").agg(
        F.sort_array(
            F.collect_list(F.struct("rec_order", "invitation", "content_json"))
        ).alias("__notes")
    )

    @F.pandas_udf("string")
    def _label(
        inv: pd.Series, cj: pd.Series, venue: pd.Series, year: pd.Series, notes_col: pd.Series
    ) -> pd.Series:
        out = []
        for i in range(len(inv)):
            packed_notes = notes_col.iloc[i]
            pairs = (
                [(n["invitation"], n["content_json"]) for n in packed_notes]
                if packed_notes is not None
                else []
            )
            out.append(label_row(inv.iloc[i], cj.iloc[i], venue.iloc[i], int(year.iloc[i]), pairs))
        return pd.Series(out)

    joined = submissions.join(
        packed, submissions["id"] == packed["parent_id"], "left"
    ).drop(packed["parent_id"])
    return joined.withColumn(
        "acceptance_tag",
        _label(F.col("invitation"), F.col("content_json"), F.col("venue"), F.col("year"), F.col("__notes")),
    ).drop("__notes")
