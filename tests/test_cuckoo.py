"""Cuckoo-filter seen tier: membership/delete/merge properties (pure numpy)
and the distributed build + exact-confirm anti-join parity (Spark)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from openreviewcrawler_spark.operators.cuckoo import (
    CuckooFilter,
    build_cuckoo,
    cuckoo_anti_join_seen,
)


def _keys(n: int, seed: int = 7) -> np.ndarray:
    return np.random.default_rng(seed).integers(-(2**62), 2**62, size=n, dtype=np.int64)


class TestFilterProperties:
    def test_no_false_negatives_at_design_load(self):
        keys = _keys(5000)
        flt = CuckooFilter.sized_for(len(keys))
        flt.add_many(keys)
        assert flt.might_contain_many(keys).all()

    def test_no_false_negatives_past_capacity_via_stash(self):
        # 4x the design load on a tiny table: kick chains WILL fail; the
        # stash must keep every insert visible (a dropped insert would be a
        # false negative -> a seen URL re-admitted as "definitely unseen")
        keys = _keys(512, seed=3)
        flt = CuckooFilter(16)  # 64 slots for 512 keys
        flt.add_many(keys)
        assert flt.might_contain_many(keys).all()
        assert len(flt.stash) > 0  # the scenario actually exercised the stash

    def test_false_positive_rate_sane(self):
        keys = _keys(4000, seed=11)
        flt = CuckooFilter.sized_for(len(keys))
        flt.add_many(keys)
        probe = _keys(20000, seed=12)
        fresh = probe[~np.isin(probe, keys)]
        fp_rate = flt.might_contain_many(fresh).mean()
        # 16-bit fp, 2 buckets x 4 slots: theoretical ~ 8/2^16 = 0.00012
        assert fp_rate < 0.005

    def test_delete_restores_admissibility_without_harming_others(self):
        keys = _keys(3000, seed=5)
        flt = CuckooFilter.sized_for(len(keys))
        flt.add_many(keys)
        due, kept = keys[:1000], keys[1000:]
        found = flt.delete_many(due)
        assert found.all()  # every inserted key's fingerprint is locatable
        # occurrence counting: deleting each inserted key exactly once can
        # NEVER produce a false negative for the keys still in the filter
        assert flt.might_contain_many(kept).all()
        # the due keys are now (almost all) admissible again; residual hits
        # are fingerprint collisions with surviving keys — rare by design
        assert flt.might_contain_many(due).mean() < 0.01

    def test_vectorized_delete_matches_sequential_reference(self):
        """r5: delete_many's bulk path (vectorized lookups for keys with
        unique (bucket,fp) pairs, per-key only under in-batch collisions)
        must be state- and flag-identical to the pure sequential walk —
        including on a batch DENSE with duplicates and fp collisions."""

        def seq_delete(flt: CuckooFilter, keys: np.ndarray) -> np.ndarray:
            from openreviewcrawler_spark.operators.cuckoo import _fingerprints

            flt._flush_stash()
            out = np.zeros(len(keys), dtype=bool)
            fp, i1 = _fingerprints(keys), flt._i1(keys)
            i2 = flt._alt(i1, fp)
            for n, (f, b1, b2) in enumerate(zip(fp, i1, i2)):
                hit = False
                for b in (int(b1), int(b2)):
                    pos = np.nonzero(flt.table[b] == f)[0]
                    if len(pos):
                        flt.table[b, pos[0]] = 0
                        hit = True
                        break
                if not hit and len(flt.stash):
                    m = np.nonzero((flt.stash[:, 0] == b1) & (flt.stash[:, 1] == f))[0]
                    if len(m) == 0:
                        m = np.nonzero(
                            (flt.stash[:, 0] == b2) & (flt.stash[:, 1] == f)
                        )[0]
                    if len(m):
                        flt.stash = np.delete(flt.stash, m[0], axis=0)
                        hit = True
                out[n] = hit
            return out

        base = _keys(5000, seed=11)
        # tiny table -> heavy stash traffic; duplicated + never-inserted keys
        batch = np.concatenate([base[:800], base[:800], _keys(400, seed=13)])
        for n_buckets in (256, 4096):
            a = CuckooFilter(n_buckets)
            a.add_many(base)
            b = CuckooFilter.from_bytes(a.to_bytes())
            fa = a.delete_many(batch)
            fb = seq_delete(b, batch)
            assert np.array_equal(fa, fb)
            assert np.array_equal(a.table, b.table)
            assert np.array_equal(
                np.sort(a.stash, axis=0), np.sort(b.stash, axis=0)
            )

    def test_merge_is_lookup_union(self):
        a_keys, b_keys = _keys(2000, seed=21), _keys(2000, seed=22)
        n = CuckooFilter.sized_for(4000).n_buckets
        a = CuckooFilter(n)
        a.add_many(a_keys)
        b = CuckooFilter(n)
        b.add_many(b_keys)
        a.merge(b)
        assert a.might_contain_many(a_keys).all()
        assert a.might_contain_many(b_keys).all()

    def test_roundtrip_bytes(self):
        keys = _keys(700, seed=31)
        flt = CuckooFilter(64)  # force stash traffic
        flt.add_many(keys)
        clone = CuckooFilter.from_bytes(flt.to_bytes())
        assert np.array_equal(clone.table, flt.table)
        assert clone.might_contain_many(keys).all()


class TestDistributed:
    def test_build_and_anti_join_equal_exact(self, spark):
        docs = spark.range(0, 4000).select(
            F.concat(F.lit("https://h"), (F.col("id") % 97).cast("string"),
                     F.lit(".example/p"), F.col("id").cast("string")).alias("url")
        )
        seen = docs.filter(F.hash("url") % 3 == 0).select(
            "url", F.hash("url").alias("url_hash")
        )
        flt = CuckooFilter.sized_for(2000)
        cuckoo = build_cuckoo(seen.repartition(8), "url_hash", flt.n_buckets)
        cand = docs.select("url", F.hash("url").alias("url_hash"))
        fast = cuckoo_anti_join_seen(cand, seen, cuckoo).select("url")
        exact = cand.join(seen.select("url"), "url", "left_anti").select("url")
        assert sorted(r["url"] for r in fast.collect()) == sorted(
            r["url"] for r in exact.collect()
        )

    def test_delete_then_filter_readmits_due(self, spark):
        docs = spark.range(0, 1000).select(
            F.concat(F.lit("https://d"), (F.col("id") % 31).cast("string"),
                     F.lit(".example/"), F.col("id").cast("string")).alias("url"),
            (F.col("id") % 10).cast("int").alias("round"),
        )
        seen = docs.select("url", F.hash("url").alias("url_hash"), "round")
        flt = CuckooFilter.sized_for(1000)
        cuckoo = build_cuckoo(seen, "url_hash", flt.n_buckets)
        due = seen.filter(F.col("round") < 3)
        due_hashes = np.array(
            [r["url_hash"] for r in due.select("url_hash").collect()], dtype=np.int64
        )
        cuckoo.delete_many(due_hashes)
        remaining = seen.join(due.select("url"), "url", "left_anti")
        out = cuckoo_anti_join_seen(
            seen.select("url", "url_hash"), remaining, cuckoo
        )
        got = sorted(r["url"] for r in out.select("url").collect())
        want = sorted(r["url"] for r in due.select("url").collect())
        assert got == want
