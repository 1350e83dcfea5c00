"""Session-28 operator: gaps-and-islands activity streaks."""

from __future__ import annotations

import collections

SF = "/root/testdata/sf0.001"


def test_activity_streaks_match_run_length_model(spark):
    from openreviewcrawler_spark.catalog import (
        _events_ms,
        q_event_activity_streaks,
    )

    ud = sorted(
        {(r["user_id"], r["ts_ms"] // 86_400_000)
         for r in _events_ms(spark, SF).collect()}
    )
    by_user = collections.defaultdict(list)
    for u, d in ud:
        by_user[u].append(d)
    lens = collections.defaultdict(lambda: [0, set()])
    total_days = 0
    for u, days in by_user.items():
        run = 1
        for a, b in zip(days, days[1:]):
            if b == a + 1:
                run += 1
            else:
                lens[run][0] += 1
                lens[run][1].add(u)
                run = 1
        lens[run][0] += 1
        lens[run][1].add(u)
        total_days += len(days)
    got = {r["streak_days"]: r for r in q_event_activity_streaks(spark, SF).collect()}
    assert set(got) == set(lens)
    n_streaks_total = sum(v[0] for v in lens.values())
    for ln, (ns, users) in lens.items():
        r = got[ln]
        assert (r["n_streaks"], r["n_users"]) == (ns, len(users))
        assert r["share_ppm"] == ns * 1_000_000 // n_streaks_total
    # conservation: streak lengths weighted by count cover every active day
    assert sum(ln * v[0] for ln, v in lens.items()) == total_days
