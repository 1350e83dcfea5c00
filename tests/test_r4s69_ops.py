"""Session-69: average neighbor degree curve."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_knn_degree_curve(spark):
    from openreviewcrawler_spark.catalog import q_graph_knn_degree_curve

    rows = {r["k"]: r for r in q_graph_knn_degree_curve(spark, SF).collect()}
    assert rows
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    edges = set()
    for d in docs:
        i = d["doc_id"]
        c5, m = (i % 20) * 5, i % 3
        for s, t in [
            (c5 + m, c5 + (m + 1) % 5),
            (c5 + m, c5 + (m + 2) % 5),
            (i % 100, (i * 7 + 3) % 83),
        ]:
            if s != t:
                edges.add((s, t))
    import collections

    deg = collections.Counter(s for s, _ in edges)
    per_k = collections.defaultdict(lambda: [0, 0, 0])
    per_src = collections.defaultdict(lambda: [0, 0])
    for s, t in edges:
        a = per_src[s]
        a[0] += deg.get(t, 0)
        a[1] += 1
    for _s, (nd_sum, k) in per_src.items():
        a = per_k[k]
        a[0] += 1
        a[1] += nd_sum
        a[2] += k
    assert set(rows) == set(per_k)
    for k, (n, ndt, et) in per_k.items():
        r = rows[k]
        assert r["n_nodes"] == n
        assert r["knn_milli"] == ndt * 1000 // et
    # the curve spans several degree classes and carries real values
    assert len(rows) > 2
    assert any(r["knn_milli"] > 0 for r in rows.values())
