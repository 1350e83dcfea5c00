"""Session-27 operator: Welch z-score A/B significance."""

from __future__ import annotations

import collections
import math
import re

SF = "/root/testdata/sf0.001"


def test_ab_zscore_matches_welch_model(spark):
    from openreviewcrawler_spark.catalog import q_event_ab_test_zscore

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    by = collections.defaultdict(lambda: ([], []))
    for r in ev:
        k = int(re.search(r"([0-9]+)", r["props"]).group(1))
        # mirror the DECIMAL(18,4) cast (values have 2dp; exact)
        by[r["event_type"]][k % 2].append(round(r["value"], 4))
    got = {r["event_type"]: r for r in q_event_ab_test_zscore(spark, SF).collect()}
    assert set(got) == set(by)
    for typ, (a, b) in by.items():
        na, nb = len(a), len(b)
        ma, mb = sum(a) / na, sum(b) / nb
        va = sum(x * x for x in a) / na - ma * ma
        vb = sum(x * x for x in b) / nb - mb * mb
        z = (mb - ma) / math.sqrt(va / na + vb / nb)
        r = got[typ]
        assert (r["n_a"], r["n_b"]) == (na, nb)
        # the engine floors z*1000 from bit-exact double arithmetic; the
        # python mirror uses a different summation order, so allow 1 milli
        assert abs(r["z_milli"] - math.floor(z * 1000)) <= 1
        assert r["significant_95"] == (1 if abs(r["z_milli"]) >= 1960 else 0)
    # random parity split of the same distribution: mostly insignificant
    assert sum(r["significant_95"] for r in got.values()) <= 2
