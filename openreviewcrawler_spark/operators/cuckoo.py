"""Cuckoo-filter URL-seen tier — the deletable fast tier the north rule names
alongside Bloom ("partition-local Bloom/cuckoo URL-seen filter merged via
treeAggregate").

Why a second filter when ``operators/seen.py`` already has Bloom: a crawler
that RE-crawls (freshness) must remove URLs from the seen structure when they
fall due, and a Bloom filter cannot delete. The cuckoo filter (Fan et al.,
CoNEXT 2014, "Cuckoo Filter: Practically Better Than Bloom") stores 16-bit
fingerprints in 4-slot buckets with two candidate buckets per key
(partial-key cuckoo hashing: ``i2 = i1 XOR h(fp)``, an involution, so either
resident bucket recovers its alternate) and supports constant-time delete.

Guarantees as used by the scheduler:

* **No false negatives on the insert-only path.** Inserts that lose a kick
  chain land in an overflow stash probed on lookup, so a "definitely unseen"
  verdict is always safe and the exact-confirm anti-join only sees the
  "maybe seen" minority — identical result to the exact tier by
  construction (same argument as the Bloom tier; proven against the SQL
  oracle by the ``crawl_seen_filter_cuckoo`` catalog entry).
* **After deletes** the filter may (with fingerprint-collision probability
  ~ 2b/2^16 per colliding key) ALSO forget a different URL sharing a
  (bucket, fingerprint) pair — the documented cuckoo-delete semantics. For
  recrawl that failure mode is a rare redundant refetch (idempotent), never
  a lost URL; the property tests bound it.
* **treeAggregate merge**: partition-local tables merge by re-inserting
  every resident fingerprint of one table into the other. A fingerprint
  found in bucket ``i`` belongs in ``{i, i XOR h(fp)}`` — both recoverable
  without the original key, so the merged table answers every lookup the
  parts did (same stash union as Bloom's bitset OR, different algebra).

Distributed shape mirrors ``seen.build_bloom``: one local filter per
partition folded over Arrow batches, a tree of pairwise merges of depth
``ceil(log4(partitions))``, one broadcast back, vectorized pandas-UDF probe.
"""

from __future__ import annotations

import math
import pickle

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .seen import _splitmix64

_FP_STREAM = np.uint64(0xA076_1D64_78BD_642F)  # decorrelate fp from bucket stream
_SLOTS = 4
_MAX_KICKS = 128


def _fingerprints(keys: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprints (0 is the empty-slot sentinel)."""
    fp = (_splitmix64(keys.astype(np.int64).view(np.uint64) ^ _FP_STREAM)
          >> np.uint64(48)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


class CuckooFilter:
    """Fixed-size cuckoo filter over int64 keys; ``n_buckets`` power of two."""

    def __init__(self, n_buckets: int, table: np.ndarray | None = None,
                 stash: np.ndarray | None = None):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be 2^k"
        self.n_buckets = n_buckets
        self.table = (table if table is not None
                      else np.zeros((n_buckets, _SLOTS), dtype=np.uint16))
        # stash rows: (bucket, fp) pairs that lost a kick chain — probed on
        # lookup so the no-false-negative guarantee survives table pressure.
        # Failed chains within one bulk call accumulate in a Python list and
        # concatenate ONCE per call (_flush_stash): np.vstack per failure is
        # O(n^2) copying under sustained overfill (r4 ADVICE finding).
        self.stash = stash if stash is not None else np.zeros((0, 2), dtype=np.int64)
        self._stash_pending: list[tuple[int, int]] = []

    @classmethod
    def sized_for(cls, n_items: int, load: float = 0.7) -> "CuckooFilter":
        need = max(int(n_items / (load * _SLOTS)), 1)
        return cls(1 << max(1, (need - 1).bit_length()))

    # -- hashing ----------------------------------------------------------
    def _i1(self, keys: np.ndarray) -> np.ndarray:
        h = _splitmix64(keys.astype(np.int64).view(np.uint64))
        return (h % np.uint64(self.n_buckets)).astype(np.int64)

    def _alt(self, bucket: np.ndarray, fp: np.ndarray) -> np.ndarray:
        h = _splitmix64(fp.astype(np.uint64))
        return (bucket.astype(np.uint64) ^ (h % np.uint64(self.n_buckets))).astype(
            np.int64
        ) % self.n_buckets

    # -- mutation ---------------------------------------------------------
    def _place(self, bucket: int, fp: int) -> bool:
        row = self.table[bucket]
        free = np.nonzero(row == 0)[0]
        if len(free):
            row[free[0]] = fp
            return True
        return False

    def _insert_one(self, bucket: int, fp: int) -> None:
        """Place with kick chain; stash on failure (never drop)."""
        if self._place(bucket, fp):
            return
        alt = int(self._alt(np.array([bucket]), np.array([fp], dtype=np.uint16))[0])
        if self._place(alt, fp):
            return
        cur_b, cur_fp = bucket, fp
        for kick in range(_MAX_KICKS):
            slot = (kick + cur_fp) % _SLOTS  # deterministic victim choice
            victim = int(self.table[cur_b, slot])
            self.table[cur_b, slot] = cur_fp
            cur_fp = victim
            cur_b = int(
                self._alt(np.array([cur_b]), np.array([cur_fp], dtype=np.uint16))[0]
            )
            if self._place(cur_b, cur_fp):
                return
        self._stash_pending.append((cur_b, cur_fp))

    def _flush_stash(self) -> None:
        """Concatenate pending stash rows once; call before any stash read."""
        if self._stash_pending:
            rows = np.array(self._stash_pending, dtype=np.int64).reshape(-1, 2)
            self.stash = np.vstack([self.stash, rows])
            self._stash_pending.clear()

    def _bulk_place(self, target: np.ndarray, fp: np.ndarray) -> np.ndarray:
        """Vectorized batch placement into ``target`` buckets: each bucket's
        first arrivals (stable order) take its free slots. Returns the mask
        of UNplaced keys, in input order — no per-key Python on the bulk
        path."""
        order = np.argsort(target, kind="stable")
        tb, tf = target[order], fp[order]
        uniq, start, inv_u = np.unique(tb, return_index=True, return_inverse=True)
        flags = self.table[uniq] != 0
        occ = flags.sum(axis=1)
        # j-th free slot of each unique row: stable argsort puts free first
        free_slots = np.argsort(flags, axis=1, kind="stable")
        rank = np.arange(len(tb)) - start[inv_u]  # arrival rank within bucket
        place = rank < (_SLOTS - occ[inv_u])
        slot = free_slots[inv_u[place], rank[place]]
        self.table[tb[place], slot] = tf[place]
        unplaced = np.empty(len(order), dtype=bool)
        unplaced[order] = ~place
        return unplaced

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        fp = _fingerprints(keys)
        i1 = self._i1(keys)
        # bulk phase: one vectorized pass on i1, one on the alternate bucket
        # settles the vast majority at load 0.7; only the remainder walks the
        # per-key kick chain
        for use_alt in (False, True):
            target = self._alt(i1, fp) if use_alt else i1
            keep = self._bulk_place(target, fp)
            fp, i1 = fp[keep], i1[keep]
            if len(fp) == 0:
                return
        for b, f in zip(i1, fp):
            self._insert_one(int(b), int(f))
        self._flush_stash()

    def delete_many(self, keys: np.ndarray) -> np.ndarray:
        """Remove one fingerprint occurrence per key; returns per-key found
        flags (False = key was never inserted OR already collision-deleted).

        Occurrence counting is deliberate (Fan et al. §3 delete contract):
        suppressing duplicate (bucket, fp) insertions would make a delete of
        one colliding key silently evict another still-live key — a false
        negative on the seen tier. Duplicate-driven fill is instead bounded
        by the caller's contract (the seen set is distinct url hashes)."""
        self._flush_stash()
        out = np.zeros(len(keys), dtype=bool)
        if len(keys) == 0:
            return out
        fp = _fingerprints(keys)
        i1 = self._i1(keys)
        i2 = self._alt(i1, fp)
        # Deletions interact only at (bucket, fingerprint) granularity: two
        # keys whose four candidate pairs are all distinct cannot consume
        # each other's occurrences, so they are order-independent and take
        # the fully vectorized path (the add_many model). Only the rare
        # in-batch pair collisions (16-bit fp) keep the sequential per-key
        # walk, which their occurrence-counting semantics require.
        pairs = np.concatenate(
            [i1 * np.int64(1 << 16) + fp, i2 * np.int64(1 << 16) + fp]
        )
        _, inv, cnt = np.unique(pairs, return_inverse=True, return_counts=True)
        per_key = cnt[inv].reshape(2, -1).max(axis=0) > 1
        clean = np.nonzero(~per_key)[0]
        if len(clean):
            fpc, b1c, b2c = fp[clean], i1[clean], i2[clean]
            eq1 = self.table[b1c] == fpc[:, None]
            hit1 = eq1.any(axis=1)
            self.table[b1c[hit1], eq1.argmax(axis=1)[hit1]] = 0
            miss = np.nonzero(~hit1)[0]
            eq2 = self.table[b2c[miss]] == fpc[miss, None]
            hit2 = eq2.any(axis=1)
            self.table[b2c[miss[hit2]], eq2.argmax(axis=1)[hit2]] = 0
            found = hit1.copy()
            found[miss[hit2]] = True
            rest = np.nonzero(~found)[0]
            if len(rest) and len(self.stash):
                sb = self.stash[:, 0][None, :]
                sf = self.stash[:, 1][None, :]
                fpl = fpc[rest].astype(np.int64)[:, None]
                m1 = (b1c[rest][:, None] == sb) & (fpl == sf)
                m2 = (b2c[rest][:, None] == sb) & (fpl == sf)
                has1, has2 = m1.any(axis=1), m2.any(axis=1)
                shit = has1 | has2
                row = np.where(has1, m1.argmax(axis=1), m2.argmax(axis=1))
                if shit.any():
                    # distinct pairs -> distinct stash rows, safe to batch
                    self.stash = np.delete(self.stash, row[shit], axis=0)
                    found[rest[shit]] = True
            out[clean] = found
        for n in np.nonzero(per_key)[0]:
            f, b1, b2 = fp[n], i1[n], i2[n]
            hit = False
            for b in (int(b1), int(b2)):
                pos = np.nonzero(self.table[b] == f)[0]
                if len(pos):
                    self.table[b, pos[0]] = 0
                    hit = True
                    break
            if not hit and len(self.stash):
                m = np.nonzero((self.stash[:, 0] == b1) & (self.stash[:, 1] == f))[0]
                if len(m) == 0:
                    m = np.nonzero(
                        (self.stash[:, 0] == b2) & (self.stash[:, 1] == f)
                    )[0]
                if len(m):
                    self.stash = np.delete(self.stash, m[0], axis=0)
                    hit = True
            out[n] = hit
        return out

    # -- lookup -----------------------------------------------------------
    def might_contain_many(self, keys: np.ndarray) -> np.ndarray:
        self._flush_stash()
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp = _fingerprints(keys)
        i1 = self._i1(keys)
        i2 = self._alt(i1, fp)
        hit = ((self.table[i1] == fp[:, None]).any(axis=1)
               | (self.table[i2] == fp[:, None]).any(axis=1))
        if len(self.stash):
            sb, sf = self.stash[:, 0][None, :], self.stash[:, 1][None, :]
            hit |= (
                ((i1[:, None] == sb) | (i2[:, None] == sb))
                & (fp.astype(np.int64)[:, None] == sf)
            ).any(axis=1)
        return hit

    # -- merge / serialization -------------------------------------------
    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        """Absorb ``other`` (same n_buckets) by fingerprint re-insertion.

        Same bulk shape as ``add_many``: one vectorized pass placing each
        resident fingerprint back into its home bucket, one into the
        alternate (recoverable without the key: i2 = i XOR h(fp) is an
        involution), and only the remainder walks per-key kick chains —
        the treeAggregate combiner stays on the vectorized path."""
        assert self.n_buckets == other.n_buckets
        other._flush_stash()
        occ_b, occ_s = np.nonzero(other.table)
        fp = other.table[occ_b, occ_s]
        b = occ_b.astype(np.int64)
        for use_alt in (False, True):
            if len(fp) == 0:
                break
            target = self._alt(b, fp) if use_alt else b
            keep = self._bulk_place(target, fp)
            fp, b = fp[keep], b[keep]
        for bb, f in zip(b, fp):
            self._insert_one(int(bb), int(f))
        self._flush_stash()
        if len(other.stash):
            self.stash = np.vstack([self.stash, other.stash])
        return self

    def to_bytes(self) -> bytes:
        self._flush_stash()
        return pickle.dumps(
            (self.n_buckets, self.table.tobytes(), self.stash.tobytes())
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        n, tbl, stash = pickle.loads(blob)
        return cls(
            n,
            np.frombuffer(tbl, dtype=np.uint16).reshape(n, _SLOTS).copy(),
            np.frombuffer(stash, dtype=np.int64).reshape(-1, 2).copy(),
        )


def build_cuckoo(
    df: DataFrame, hash_col: str, n_buckets: int, tree_depth: int | None = None
) -> CuckooFilter:
    """Partition-local cuckoo build + treeAggregate fingerprint-merge
    (the exact shape of ``seen.build_bloom``; merge algebra differs)."""

    def _per_partition(batches):
        local = CuckooFilter(n_buckets)
        for pdf in batches:
            local.add_many(pdf[hash_col].to_numpy())
        yield pd.DataFrame({"cuckoo": [local.to_bytes()]})

    blobs = df.select(hash_col).mapInPandas(_per_partition, "cuckoo binary")
    rdd = blobs.rdd.map(lambda r: bytes(r["cuckoo"]))
    n_parts = max(rdd.getNumPartitions(), 1)
    if tree_depth is None:
        tree_depth = max(1, math.ceil(math.log(n_parts, 4))) if n_parts > 1 else 1
    zero = CuckooFilter(n_buckets).to_bytes()

    def _merge(a: bytes, b: bytes) -> bytes:
        return (
            CuckooFilter.from_bytes(a).merge(CuckooFilter.from_bytes(b)).to_bytes()
        )

    return CuckooFilter.from_bytes(rdd.treeAggregate(zero, _merge, _merge, depth=tree_depth))


def cuckoo_anti_join_seen(
    candidates: DataFrame,
    seen: DataFrame,
    cuckoo: CuckooFilter,
    url_col: str = "url",
    hash_col: str = "url_hash",
) -> DataFrame:
    """Exact-semantics seen filter with the cuckoo fast path: "definitely
    unseen" bypasses the shuffle, "maybe seen" is confirmed exactly.
    Insert-only filters yield results identical to the plain anti-join
    (no false negatives); use ``delete_many`` first to re-admit recrawl-due
    URLs (then the exact confirm must run against seen MINUS due)."""
    spark = candidates.sparkSession
    blob = spark.sparkContext.broadcast(cuckoo.to_bytes())

    @F.pandas_udf("boolean")
    def _maybe_seen(hashes: pd.Series) -> pd.Series:
        flt = CuckooFilter.from_bytes(blob.value)
        return pd.Series(flt.might_contain_many(hashes.to_numpy()))

    flagged = candidates.withColumn("__maybe", _maybe_seen(F.col(hash_col)))
    new = flagged.filter(~F.col("__maybe")).drop("__maybe")
    confirm = (
        flagged.filter(F.col("__maybe"))
        .drop("__maybe")
        .join(seen.select(url_col), url_col, "left_anti")
    )
    return new.unionByName(confirm)
