"""Presentation surface: draw_forum ASCII parity + SVG chart sinks.

The ASCII oracle here is a direct transliteration of the reference's
recursion (/root/reference/comment_tree.py:119-137 + the replies-list
assembly of create_comment_tree) so engine-vs-oracle equality is meaningful:
same header format, same per-note line, same DFS child order (recording
order), same broken-chain drops.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyspark.sql.functions as F
import pytest

from openreviewcrawler_spark.operators.render import (
    draw_forum,
    forum_ascii_lines,
    reply_forest_paths,
)
from openreviewcrawler_spark.sources import chart_svg


def _reference_draw(forum: str, title: str, notes: list[tuple[str, str]]) -> list[str]:
    """Reference twin: create_comment_tree keeps notes whose replyto chain
    reaches the forum, children appended in recording order; __draw_note
    recursion with 4-space prefix growth."""
    parent = dict(notes)
    kept = []
    for nid, _ in notes:
        cur, seen = nid, {nid}
        while True:
            p = parent.get(cur)
            if p == forum:
                kept.append(nid)
                break
            if p is None or p not in parent or p in seen:
                break
            seen.add(p)
            cur = p
    keptset = set(kept)
    children: dict[str, list[str]] = {}
    roots = []
    for nid, rt in notes:
        if nid not in keptset:
            continue
        if rt == forum:
            roots.append(nid)
        else:
            children.setdefault(rt, []).append(nid)
    lines = [f"-->  {forum} : {title}"]

    def rec(nid: str, prefix: str) -> None:
        lines.append(f"{prefix}|--- {nid}")
        for c in children.get(nid, []):
            rec(c, prefix + "    ")

    for r in roots:
        rec(r, "")
    return lines


NOTES = [  # (id, replyto) in recording order; f1 root, chains + breaks
    ("a", "f1"),
    ("b", "a"),
    ("z", "missing"),  # broken chain -> dropped
    ("c", "f1"),
    ("d", "b"),
    ("e", "a"),  # sibling of b recorded AFTER d: DFS must still visit b-subtree first
    ("q", "z"),  # descendant of broken chain -> dropped
]


def test_draw_forum_matches_reference_recursion(spark):
    notes = spark.createDataFrame(
        [(f, i, r, n) for n, (i, r) in enumerate(NOTES) for f in ["f1"]],
        "forum string, id string, replyto string, rec_order long",
    )
    edges = reply_forest_paths(notes)
    got = draw_forum(edges, "f1", "A Title")
    want = _reference_draw("f1", "A Title", NOTES)
    assert got == want
    # depth-3 line carries 8-space prefix exactly
    assert "        |--- d" in got


def test_forum_ascii_lines_multi_forum_order(spark):
    rows = [("f1", i, r, n) for n, (i, r) in enumerate(NOTES)] + [
        ("f2", "x", "f2", 100),
        ("f2", "y", "x", 101),
    ]
    notes = spark.createDataFrame(
        rows, "forum string, id string, replyto string, rec_order long"
    )
    titles = notes.select("forum").distinct().select(
        "forum", F.concat(F.lit("Forum "), F.col("forum")).alias("title")
    )
    out = (
        forum_ascii_lines(reply_forest_paths(notes), titles)
        .orderBy("forum", "sort_key")
        .collect()
    )
    lines = [r["line"] for r in out]
    want = _reference_draw("f1", "Forum f1", NOTES) + _reference_draw(
        "f2", "Forum f2", [("x", "f2"), ("y", "x")]
    )
    assert lines == want


@pytest.fixture(scope="module")
def rollup_df(spark):
    rows = [
        ("ICLR.cc", 2019, 3, 2, 1, 0, 0, [4, 0, 2], 3, 1, 1, 1),
        ("ICLR.cc", 2020, 2, 1, 0, 1, 0, [5, 1], 4, 0, 2, 0),
        ("MIDL.io", 2019, 1, 0, 0, 0, 1, [0], 0, 0, 0, 0),
    ]
    return spark.createDataFrame(
        rows,
        "venue string, year int, sub long, accepted long, rejected long,"
        " withdrawn long, unknown long, comments_per_submission array<long>,"
        " review long, plain_comment long, decision long, other long",
    )


def _svg_root(data: bytes) -> ET.Element:
    root = ET.fromstring(data)
    assert root.tag.endswith("svg")
    return root


def test_label_heatmap_values_and_shape(rollup_df):
    root = _svg_root(chart_svg.plot_label_heatmap(rollup_df))
    texts = [t.text for t in root.iter() if t.tag.endswith("text") and t.text]
    # cell annotations are ' {:.1f} ' of count/sub (reference fmt): ICLR 2019
    # accepted 2/3 = 0.7 after round; MIDL unknown 1/1 = 1.0
    assert " 0.7 " in texts and " 1.0 " in texts
    rects = [r for r in root.iter() if r.tag.endswith("rect")]
    assert len(rects) == 1 + 3 * 4  # background + 3 venue-years x 4 labels


def test_comment_type_heatmap_zero_guard(rollup_df):
    root = _svg_root(chart_svg.plot_comment_type_heatmap(rollup_df))
    texts = [t.text for t in root.iter() if t.tag.endswith("text") and t.text]
    # MIDL has 0 total comments -> all four cells 0.0, no div error
    assert texts.count(" 0.0 ") >= 4


def test_sub_venue_bar_sorted_ascending(rollup_df):
    root = _svg_root(chart_svg.plot_sub_venue(rollup_df, reduce_year=True))
    texts = [t.text for t in root.iter() if t.tag.endswith("text") and t.text]
    # reduce_year sums ICLR to 5, MIDL 1; ascending order puts MIDL first
    i_midl, i_iclr = texts.index("MIDL.io"), texts.index("ICLR.cc")
    assert i_midl < i_iclr
    assert "5" in texts and "1" in texts  # autolabel annotations


def test_comment_venue_box_medians(rollup_df):
    data = chart_svg.plot_comment_venue(rollup_df, reduce_year=False)
    root = _svg_root(data)
    lines = [e for e in root.iter() if e.tag.endswith("line")]
    assert len(lines) == 3  # one median tick per venue-year
    texts = [t.text for t in root.iter() if t.tag.endswith("text") and t.text]
    assert "6" in texts  # ICLR 2019 total comments, annotated on the bar


def test_count_distribution_density(spark):
    from openreviewcrawler_spark.operators.stats import count_histogram

    df = spark.createDataFrame(
        [(0,), (0,), (1,), (2,), (2,), (2,), (99,)], "n_notes int"
    )
    hist = count_histogram(df, "n_notes", cap=30)  # 99 dropped as outlier
    root = _svg_root(
        chart_svg.plot_count_distribution(
            hist, "Comments per submission", "Distribution of Comments"
        )
    )
    rects = [r for r in root.iter() if r.tag.endswith("rect")]
    assert len(rects) == 1 + 3  # background + bins 0,1,2
    heights = sorted(float(r.get("height")) for r in rects[1:])
    # densities 2/6, 1/6, 3/6 -> bar heights proportional 2:1:3
    assert heights[1] / heights[0] == pytest.approx(2.0, rel=1e-3)
    assert heights[2] / heights[0] == pytest.approx(3.0, rel=1e-3)


def test_write_figures_roundtrip(tmp_path, rollup_df):
    figs = {"label_fig": chart_svg.plot_label_heatmap(rollup_df)}
    paths = chart_svg.write_figures(figs, str(tmp_path))
    assert paths == [str(tmp_path / "label_fig.svg")]
    ET.parse(paths[0])  # well-formed on disk
