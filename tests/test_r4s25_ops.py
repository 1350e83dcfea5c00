"""Session-25 operators: DAU forecast backtest, bow-tie-lite node classes."""

from __future__ import annotations

import collections

SF = "/root/testdata/sf0.001"

DAY = 86_400_000


def test_dau_forecast_backtest_matches_model(spark):
    from openreviewcrawler_spark.catalog import (
        _events_ms,
        q_event_dau_forecast_backtest,
    )

    ud = {(r["user_id"], r["ts_ms"] // DAY) for r in _events_ms(spark, SF).collect()}
    dau = collections.Counter(d for _u, d in ud)
    days = sorted(dau)
    expect = {}
    for i, d in enumerate(days):
        hist = [dau[x] for x in days[max(0, i - 7):i]]
        if hist:
            fc = sum(hist) // len(hist)
            expect[d] = (dau[d], fc, abs(dau[d] - fc) * 1_000_000 // dau[d])
    got = {
        r["day"]: (r["dau"], r["forecast_dau"], r["ape_ppm"])
        for r in q_event_dau_forecast_backtest(spark, SF).collect()
    }
    assert got == expect
    # first observed day has no history -> no row
    assert days[0] not in got


def test_sink_source_classes_partition_the_node_set(spark):
    from openreviewcrawler_spark.catalog import q_graph_sink_source_nodes

    ids = [r["doc_id"] for r in
           spark.read.parquet(f"{SF}/documents.parquet").select("doc_id").collect()]
    out_n = collections.Counter()
    in_n = collections.Counter()
    for i in ids:
        s, d = i % 997, (i * 13 + 5) % 997
        if s != d:
            out_n[s] += 1
            in_n[d] += 1
    nodes = set(out_n) | set(in_n)
    expect = collections.defaultdict(lambda: [0, 0, 0])
    for n in nodes:
        od, ind = out_n.get(n, 0), in_n.get(n, 0)
        cls = "source" if (od and not ind) else "sink" if (ind and not od) else "core"
        e = expect[cls]
        e[0] += 1
        e[1] += od
        e[2] += ind
    got = {r["node_class"]: r for r in q_graph_sink_source_nodes(spark, SF).collect()}
    assert set(got) == set(expect)
    for cls, (n, od, ind) in expect.items():
        r = got[cls]
        assert (r["n_nodes"], r["n_outlinks"], r["n_inlinks"]) == (n, od, ind)
    assert sum(r["n_nodes"] for r in got.values()) == len(nodes)
    # global conservation: total out == total in == edge count
    assert sum(r["n_outlinks"] for r in got.values()) == sum(
        r["n_inlinks"] for r in got.values()
    )
