"""Probabilistic sketches for web-scale frontier accounting.

The reference keeps its seen-set and per-venue tallies as exact in-memory
dicts (/root/reference/crawler.py `already_done` + counters) — fine for 10^5
notes, impossible for a 10^10-URL frontier. This module adds the two sketch
primitives a 100 TB crawl ledger actually runs on:

* **HyperLogLog** distinct-URL cardinality (Flajolet et al. 2007): one
  map-side-partial ``groupBy`` over at most ``m = 2^b`` register groups —
  the shuffle is O(m) regardless of input size, which is the whole point.
* **Count-min** heavy hitters (Cormode & Muthukrishnan 2005): the sketch
  itself is a ``d x w`` counts table (a few hundred rows, broadcast-able by
  construction), so per-key frequency estimates attach to any stream with a
  map-side join no matter how many distinct keys exist.

Determinism / cross-engine exactness (the repr() oracle gate):

* All hashing is the repo-standard ``hash32`` (first 8 md5 hex chars as an
  integer) — md5 is the only hash both Spark and DuckDB 1.0 share.
* ``rho`` (HLL register value) is the trailing-zero rank of the suffix
  word, computed by a generated CASE over ``w % 2^k`` residues that is
  shared VERBATIM between both engines — no ``log``/``ln`` anywhere
  (JVM Math.log vs libm differ in the last ulp; CLAUDE.md r4 lesson).
* The harmonic sum ``sum_j 2^-M[j]`` is kept in INTEGERS: each term is
  ``2^(RHO_MAX - M[j])`` (min term 1, max ``2^(RHO_MAX-1)``), so the sum is
  fold-order independent and the only float op is one per-row division on
  the final single-row estimate — bit-identical across engines.
* Count-min is pure integer counting end to end.

No corrections (linear counting / large-range) are applied to the HLL
estimate: both require ``ln``. The raw estimator plus the zero-register
count is emitted instead; callers needing the corrected number apply it
driver-side on the one-row result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- HyperLogLog -----------------------------------------------------------

#: register-index bits (m = 256 registers). The suffix word then carries
#: 32 - 8 = 24 bits, so rho in [1, 24] with rho = 25 reserved for w == 0.
HLL_B_BITS = 8
HLL_M = 1 << HLL_B_BITS
HLL_RHO_MAX = 32 - HLL_B_BITS + 1  # 25
#: alpha_256 = 0.7213 / (1 + 1.079/256) — the standard bias constant for
#: m >= 128 (Flajolet et al. 2007, fig. 3). A double literal; used once in
#: per-row arithmetic on the final single-row result (bit-stable).
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 256.0)


def rho_case_sql(w_expr: str, rho_max: int = HLL_RHO_MAX) -> str:
    """Trailing-zero rank of ``w_expr`` (+1), as a CASE chain shared
    verbatim between Spark SQL and DuckDB: ``tz(w) = k`` iff
    ``w % 2^(k+1) == 2^k``; ``w = 0`` maps to ``rho_max``. All constants are
    < 2^25, far under the DuckDB BIGINT-mixing bound."""
    arms = "\n".join(
        f"  when ({w_expr}) % {1 << (k + 1)} = {1 << k} then {k + 1}"
        for k in range(rho_max - 1)
    )
    return f"case when ({w_expr}) = 0 then {rho_max}\n{arms}\nend"


def hll_registers_df(df: DataFrame, key_col: str) -> DataFrame:
    """Registers table ``(bucket, rho)`` — one row per NON-EMPTY register
    (at most ``HLL_M`` rows after the groupBy, with map-side partial max so
    the shuffle carries at most m rows per input partition)."""
    hashed = df.select(
        F.conv(F.substring(F.md5(F.col(key_col)), 1, 8), 16, 10)
        .cast("long")
        .alias("h32")
    )
    wordy = hashed.select(
        F.pmod("h32", F.lit(HLL_M)).cast("int").alias("bucket"),
        F.expr(f"h32 div {HLL_M}").alias("w"),
    )
    with_rho = wordy.select(
        "bucket", F.expr(rho_case_sql("w")).cast("int").alias("rho")
    )
    return with_rho.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate_df(df: DataFrame, key_col: str) -> DataFrame:
    """One-row HLL summary: ``(m, n_zero, harmonic_scaled, est_distinct)``.

    ``harmonic_scaled = sum_j 2^(RHO_MAX - M[j])`` over ALL m registers
    (empty registers contribute ``2^RHO_MAX`` each) — an exact integer
    < 2^34, so the aggregation is fold-order independent. The raw estimate
    is then one per-row double expression:
    ``alpha * m^2 * 2^RHO_MAX / harmonic_scaled``.
    """
    regs = hll_registers_df(df, key_col)
    scaled_term = F.expr(f"shiftleft(cast(1 as bigint), {HLL_RHO_MAX} - rho)")
    agg = regs.agg(
        F.count("*").cast("long").alias("n_hit"),
        F.sum(scaled_term).cast("long").alias("hit_sum"),
    )
    n_zero = (F.lit(HLL_M).cast("long") - F.col("n_hit")).alias("n_zero")
    harmonic = (
        F.col("hit_sum") + (F.lit(HLL_M) - F.col("n_hit")) * F.lit(1 << HLL_RHO_MAX)
    ).cast("long")
    numer = float(HLL_ALPHA * HLL_M * HLL_M * (1 << HLL_RHO_MAX))
    return agg.select(
        F.lit(HLL_M).cast("long").alias("m"),
        n_zero,
        harmonic.alias("harmonic_scaled"),
        F.round(F.lit(numer) / harmonic.cast("double"), 4).alias("est_distinct"),
    )


def hll_oracle_sql(key_sql: str, from_sql: str) -> str:
    """DuckDB twin of ``hll_estimate_df`` over ``select {key_sql} from
    {from_sql}``. The rho CASE snippet is the SAME generated string; hash,
    bucketing and the integer harmonic sum mirror the Spark shapes
    (``//`` for ``div``, ``('0x'||..)::BIGINT`` for ``conv``)."""
    numer = repr(HLL_ALPHA * HLL_M * HLL_M * (1 << HLL_RHO_MAX))
    return f"""
with h as (
  select ('0x' || substr(md5({key_sql}), 1, 8))::BIGINT as h32 from {from_sql}
), wr as (
  select (h32 % {HLL_M})::INT as bucket, h32 // {HLL_M} as w from h
), reg as (
  select bucket, max({rho_case_sql('w')})::INT as rho from wr group by bucket
), agg as (
  select count(*)::BIGINT as n_hit,
         sum((1::BIGINT << ({HLL_RHO_MAX} - rho)))::BIGINT as hit_sum
  from reg
)
select {HLL_M}::BIGINT as m,
       ({HLL_M} - n_hit)::BIGINT as n_zero,
       (hit_sum + ({HLL_M} - n_hit) * {1 << HLL_RHO_MAX})::BIGINT as harmonic_scaled,
       round({numer} / (hit_sum + ({HLL_M} - n_hit) * {1 << HLL_RHO_MAX})::DOUBLE, 4)
         as est_distinct
from agg
"""


def hll_estimate_by_group(
    df: DataFrame, group_col: str, key_col: str
) -> DataFrame:
    """Per-group HLL summary: ``(group, m, n_zero, harmonic_scaled,
    est_distinct)`` — one sketch per group, registers keyed (group,
    bucket), so the shuffle carries at most m rows per group per input
    partition and the estimate table is O(groups). The grouped variant of
    :func:`hll_estimate_df`, same raw estimator + n_zero emission (the
    low-fill linear-counting correction needs ln — not in the
    cross-engine budget — so callers apply it driver-side)."""
    hashed = df.select(
        F.col(group_col).alias("grp"),
        F.conv(F.substring(F.md5(F.col(key_col)), 1, 8), 16, 10)
        .cast("long")
        .alias("h32"),
    )
    wordy = hashed.select(
        "grp",
        F.pmod("h32", F.lit(HLL_M)).cast("int").alias("bucket"),
        F.expr(f"h32 div {HLL_M}").alias("w"),
    )
    regs = (
        wordy.select(
            "grp", "bucket", F.expr(rho_case_sql("w")).cast("int").alias("rho")
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    scaled_term = F.expr(f"shiftleft(cast(1 as bigint), {HLL_RHO_MAX} - rho)")
    agg = regs.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_hit"),
        F.sum(scaled_term).cast("long").alias("hit_sum"),
    )
    harmonic = (
        F.col("hit_sum") + (F.lit(HLL_M) - F.col("n_hit")) * F.lit(1 << HLL_RHO_MAX)
    ).cast("long")
    numer = float(HLL_ALPHA * HLL_M * HLL_M * (1 << HLL_RHO_MAX))
    return agg.select(
        F.col("grp").alias(group_col),
        F.lit(HLL_M).cast("long").alias("m"),
        (F.lit(HLL_M).cast("long") - F.col("n_hit")).alias("n_zero"),
        harmonic.alias("harmonic_scaled"),
        F.round(F.lit(numer) / harmonic.cast("double"), 4).alias("est_distinct"),
    )


def hll_group_oracle_sql(group_sql: str, key_sql: str, from_sql: str) -> str:
    """DuckDB twin of :func:`hll_estimate_by_group` — same generated rho
    CASE, same integer harmonic sum, grouped."""
    numer = repr(HLL_ALPHA * HLL_M * HLL_M * (1 << HLL_RHO_MAX))
    return f"""
with h as (
  select {group_sql} as grp,
         ('0x' || substr(md5({key_sql}), 1, 8))::BIGINT as h32
  from {from_sql}
), wr as (
  select grp, (h32 % {HLL_M})::INT as bucket, h32 // {HLL_M} as w from h
), reg as (
  select grp, bucket, max({rho_case_sql('w')})::INT as rho
  from wr group by grp, bucket
), agg as (
  select grp, count(*)::BIGINT as n_hit,
         sum((1::BIGINT << ({HLL_RHO_MAX} - rho)))::BIGINT as hit_sum
  from reg group by grp
)
select grp, {HLL_M}::BIGINT as m,
       ({HLL_M} - n_hit)::BIGINT as n_zero,
       (hit_sum + ({HLL_M} - n_hit) * {1 << HLL_RHO_MAX})::BIGINT
         as harmonic_scaled,
       round({numer} / (hit_sum + ({HLL_M} - n_hit)
                        * {1 << HLL_RHO_MAX})::DOUBLE, 4) as est_distinct
from agg
"""


# --- Count-min heavy hitters ------------------------------------------------

#: sketch geometry: d hash rows x w buckets. d*w = 256 counter cells — the
#: counts relation is broadcast-able BY CONSTRUCTION (its size is fixed by
#: the sketch, not by the corpus), which is what makes the per-key estimate
#: join safe at any scale.
CM_DEPTH = 4
CM_WIDTH = 64


def cm_counts_df(df: DataFrame, key_col: str) -> DataFrame:
    """The sketch itself: ``(i, bucket, cnt)`` — ONE explode per input row
    (the r3 single-explode rule: never union N selects over one upstream),
    then one map-side-partial groupBy over at most d*w groups."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.pmod(
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.col(key_col), F.lit(f"#cm{i}"))), 1, 8
                        ),
                        16,
                        10,
                    ).cast("long"),
                    F.lit(CM_WIDTH),
                )
                .cast("int")
                .alias("bucket"),
            )
            for i in range(CM_DEPTH)
        ]
    )
    exploded = df.select(F.explode(cells).alias("c")).select("c.i", "c.bucket")
    return exploded.groupBy("i", "bucket").agg(F.count("*").cast("long").alias("cnt"))


def cm_estimates_df(df: DataFrame, key_col: str) -> DataFrame:
    """Per-distinct-key count-min estimate vs truth:
    ``(key, true_cnt, est_cnt, overcount)`` with ``est_cnt >= true_cnt``
    always (one-sided error). The counts table is broadcast (it has at most
    d*w = 256 rows by construction); the key side never shuffles beyond its
    own distinct groupBy."""
    counts = cm_counts_df(df, key_col)
    truth = df.groupBy(key_col).agg(F.count("*").cast("long").alias("true_cnt"))
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.pmod(
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.col(key_col), F.lit(f"#cm{i}"))), 1, 8
                        ),
                        16,
                        10,
                    ).cast("long"),
                    F.lit(CM_WIDTH),
                )
                .cast("int")
                .alias("bucket"),
            )
            for i in range(CM_DEPTH)
        ]
    )
    probes = truth.select(
        key_col, "true_cnt", F.explode(cells).alias("c")
    ).select(key_col, "true_cnt", "c.i", "c.bucket")
    joined = probes.join(F.broadcast(counts), ["i", "bucket"])
    est = joined.groupBy(key_col, "true_cnt").agg(F.min("cnt").alias("est_cnt"))
    return est.select(
        F.col(key_col),
        "true_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("true_cnt")).cast("long").alias("overcount"),
    )


def cm_oracle_sql(key_sql: str, from_sql: str, key_alias: str = "k") -> str:
    """DuckDB twin of ``cm_estimates_df``: same salted-md5 buckets, same
    integer counting; row index via a 4-row VALUES relation."""
    rows = ", ".join(f"({i})" for i in range(CM_DEPTH))
    return f"""
with keys as (select {key_sql} as k from {from_sql}),
d(i) as (values {rows}),
cells as (
  select i,
         (('0x' || substr(md5(k || '#cm' || cast(i as varchar(4))), 1, 8))::BIGINT
          % {CM_WIDTH})::INT as bucket
  from keys cross join d
),
counts as (select i, bucket, count(*)::BIGINT as cnt from cells group by 1, 2),
truth as (select k, count(*)::BIGINT as true_cnt from keys group by 1),
probes as (
  select t.k, t.true_cnt, d.i,
         (('0x' || substr(md5(t.k || '#cm' || cast(d.i as varchar(4))), 1, 8))::BIGINT
          % {CM_WIDTH})::INT as bucket
  from truth t cross join d
)
select p.k as {key_alias}, p.true_cnt, min(c.cnt)::BIGINT as est_cnt,
       (min(c.cnt) - p.true_cnt)::BIGINT as overcount
from probes p join counts c on p.i = c.i and p.bucket = c.bucket
group by p.k, p.true_cnt
"""
