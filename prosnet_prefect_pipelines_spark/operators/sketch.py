"""Portable distributed sketches (north-star extension): HyperLogLog
distinct counting and Bloom-filter join pruning, built so their VALUES
— not just their contracts — are reproducible across engines.

Why portability matters here: sketches usually hide engine-specific
hashing (Spark's approx_count_distinct, xxhash bloom builders), which
makes their outputs unverifiable by any second system. Both sketches
below hash with the 48-bit md5-prefix family the dedup/sampling tiers
use, and restrict arithmetic to integers + dyadic-rational doubles —
every register value and every estimate is bit-identical in DuckDB
(the correctness gate runs exactly that comparison).

Scale shape: HLL registers reduce with map-side-combined MAX (one
shuffle keyed by (group, register)); the Bloom build aggregates bit
positions distributed-side and only the m-bit bitset — kilobytes —
reaches the driver for broadcast, equivalent to a broadcast-join build
side but orders of magnitude smaller.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators.dedup import portable_id

# --- HyperLogLog ----------------------------------------------------------

HLL_B = 9  # 2^9 = 512 registers
HLL_M = 1 << HLL_B
_REM_BITS = 48 - HLL_B  # 39 value bits feeding the rank


def hll_register(key: Column) -> tuple[Column, Column]:
    """(register index, rank) of one key: bucket = top ``HLL_B`` hash
    bits, rank = leading-zero count of the remaining bits + 1.

    Integer/dyadic arithmetic only: the bucket divide is exact (h < 2^48
    fits a double mantissa; dividing by a power of two rounds nothing),
    and the rank uses binary-string length, not log2 — libm-free, so
    register values are engine-exact integers.
    """
    h = portable_id(key.cast("string"))
    bucket = F.floor(h / F.lit(float(1 << _REM_BITS))).cast("long")
    rem = h.bitwiseAND(F.lit((1 << _REM_BITS) - 1))
    bitlen = F.when(rem == 0, F.lit(0)).otherwise(
        F.length(F.conv(rem.cast("string"), 10, 2))
    )
    rank = F.lit(_REM_BITS + 1) - bitlen
    return bucket, rank


def hll_registers(df: DataFrame, group_cols: list[str], key_col: str) -> DataFrame:
    """Per-group register table -> (group..., _b, _rank): the sketch's
    MERGEABLE partial state. MAX rank per (group, register), map-side
    combined — <= 512 rows per group regardless of input size. Sketches
    of disjoint (or overlapping!) batches merge by unioning register
    tables and re-MAXing: see :func:`hll_merge_registers`."""
    bucket, rank = hll_register(F.col(key_col))
    return (
        df.select(*[F.col(c) for c in group_cols], bucket.alias("_b"), rank.alias("_r"))
        .groupBy(*group_cols, "_b")
        .agg(F.max("_r").alias("_rank"))
    )


def hll_merge_registers(*reg_tables: DataFrame) -> DataFrame:
    """Merge register tables (same group columns) — union + MAX. The
    lattice property that makes HLL incremental: merging a day's sketch
    into a year's is 512 rows of work, and re-delivered batches are
    absorbed idempotently (MAX is idempotent)."""
    merged = reg_tables[0]
    for t in reg_tables[1:]:
        merged = merged.unionByName(t)
    keys = [c for c in merged.columns if c not in ("_rank",)]
    return merged.groupBy(*keys).agg(F.max("_rank").alias("_rank"))


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Registers -> (group..., hll_estimate, registers_set).

    Exactness of the float math: every ``2^-rank`` is a dyadic rational
    with exponent >= -(48-B+1); the per-group sum of <= 512 such terms
    fits a double's 53-bit mantissa without rounding, so the sum is
    order-independent — and alpha*m^2/denom is a chain of single IEEE
    ops, identical on every conforming engine. (The small-range
    linear-counting correction needs ln(), which is NOT portable — this
    sketch reports the raw estimate; callers wanting the correction
    apply it to ``registers_set`` downstream.) Estimate floor-cast to
    BIGINT for a stable surface.
    """
    alpha = 0.7213 / (1.0 + 1.079 / HLL_M)
    # zero registers contribute 2^0 = 1 each: denom = (m - set) + sum(2^-rank)
    return (
        regs.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("_set"),
            F.sum(
                F.lit(1.0)
                / F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_rank AS INT))")
            ).alias("_s"),
        )
        .select(
            *group_cols,
            F.floor(
                F.lit(alpha * HLL_M * HLL_M)
                / (F.col("_s") + (F.lit(HLL_M) - F.col("_set")).cast("double"))
            )
            .cast("long")
            .alias("hll_estimate"),
            F.col("_set").cast("long").alias("registers_set"),
        )
    )


def hll_distinct(df: DataFrame, group_cols: list[str], key_col: str) -> DataFrame:
    """Per-group HLL distinct estimate -> (group..., hll_estimate,
    registers_set): :func:`hll_registers` + :func:`hll_estimate` —
    two map-side-combined aggregations end to end."""
    return hll_estimate(hll_registers(df, group_cols, key_col), group_cols)


# --- Bloom-filter join pruning -------------------------------------------

BLOOM_M = 1 << 14  # bits (2 KB bitset)
BLOOM_K = 4  # probes


def _bloom_positions(key: Column) -> list[Column]:
    """k bit positions via double hashing: (h1 + j*h2) mod m."""
    h1 = portable_id(key.cast("string"))
    h2 = portable_id(F.concat(key.cast("string"), F.lit("#2")))
    return [F.pmod(h1 + F.lit(j) * h2, F.lit(BLOOM_M)) for j in range(BLOOM_K)]


def bloom_build(dim: DataFrame, key_col: str) -> list[int]:
    """Aggregate the dim side's Bloom bitset -> ``BLOOM_M/64`` signed
    words.

    The heavy work (hashing every dim key) is distributed; only the
    DISTINCT bit positions — at most m = 16384 ints — are collected, so
    the driver sees kilobytes regardless of dim cardinality. For dims
    small enough to broadcast-join anyway the filter is pointless; its
    scale case is a dim too big to broadcast, where the 2 KB bitset
    still rides the task closure and prunes the fact scan before the
    shuffle.
    """
    pos_col = F.explode(F.array(*_bloom_positions(F.col(key_col)))).alias("p")
    rows = dim.select(pos_col).distinct().collect()
    words = [0] * (BLOOM_M // 64)
    for r in rows:
        words[r.p // 64] |= 1 << (r.p % 64)
    # two's-complement fold into signed 64-bit (Spark BIGINT is signed);
    # (w >> bit) & 1 still extracts every bit correctly under arithmetic
    # shift, including bit 63
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_prune(df: DataFrame, key_col: str, words: list[int]) -> DataFrame:
    """Keep rows whose key the bitset may contain (every present key
    kept — no false negatives). The bitset rides the plan as ONE array
    literal column; probes are variable-shift bit tests via named
    columns, evaluated in the scan stage before any shuffle."""
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    out = (
        df.withColumn("_bloom", arr)
        .withColumn("_h1", portable_id(F.col(key_col).cast("string")))
        .withColumn(
            "_h2",
            portable_id(F.concat(F.col(key_col).cast("string"), F.lit("#2"))),
        )
    )
    cond: Column = F.lit(True)
    for j in range(BLOOM_K):
        p = f"pmod(_h1 + {j} * _h2, {BLOOM_M})"
        cond = cond & F.expr(
            f"(shiftright(element_at(_bloom, CAST({p} div 64 AS INT) + 1), "
            f"CAST({p} % 64 AS INT)) & 1) = 1"
        )
    return out.filter(cond).drop("_bloom", "_h1", "_h2")


def bloom_semi_join(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str
) -> DataFrame:
    """Exact semi-join accelerated by a Bloom pre-filter: the bitset
    prunes fact rows BEFORE the join shuffle; false positives are then
    removed by the real semi-join, so results are exact — the sketch
    only moves work, never changes answers (which is why the DuckDB
    oracle is a plain semi-join)."""
    words = bloom_build(dim, dim_key)
    pruned = bloom_prune(fact, fact_key, words)
    return pruned.join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(),
        on=fact_key,
        how="left_semi",
    )


# --- Count-Min sketch ------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 1024  # buckets per row


def _cms_positions(key: Column) -> list[Column]:
    """One bucket per hash row, via the same double-hashing family as the
    Bloom filter (disjoint salt)."""
    h1 = portable_id(F.concat(key.cast("string"), F.lit("#cms1")))
    h2 = portable_id(F.concat(key.cast("string"), F.lit("#cms2")))
    return [F.pmod(h1 + F.lit(d) * h2, F.lit(CMS_W)) for d in range(CMS_D)]


def cms_build(df: DataFrame, key_col: str) -> DataFrame:
    """Count-Min sketch of key frequencies -> (d, bucket, c).

    The sketch is CMS_D x CMS_W counters (4 KB of state) built with ONE
    map-side-combined aggregation — the frequency table for a 100 TB
    key stream reduces to a constant-size table any engine can verify
    (md5-derived buckets, integer counts). Mergeable: sketches of
    disjoint batches merge by (d, bucket) SUM.
    """
    pos = F.posexplode(F.array(*_cms_positions(F.col(key_col)))).alias(
        "d", "bucket"
    )
    return (
        df.select(pos)
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(cms: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Frequency estimates for ``keys`` -> (key..., cms_estimate).

    estimate = MIN over hash rows of the key's bucket counter — never an
    underestimate (every occurrence incremented the counter), biased
    high only by collisions. CMS_D lookups resolve as one (d, bucket)
    equi-join against the 4 KB sketch (broadcast), then a keyed MIN.
    """
    probes = keys.select(
        F.col(key_col),
        F.posexplode(F.array(*_cms_positions(F.col(key_col)))).alias("d", "bucket"),
    )
    return (
        probes.join(F.broadcast(cms), on=["d", "bucket"], how="left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("cms_estimate"))
    )


def cms_join_cardinality(cms_a: DataFrame, cms_b: DataFrame) -> DataFrame:
    """Join-size estimate from two Count-Min sketches -> one row
    ``(join_card_estimate: long)``.

    |A join_k B| = sum over keys of cA(k)*cB(k); each CMS row's
    bucket-wise inner product SUM(cA*cB) never underestimates it
    (collisions only add), so MIN over the d rows is the tightest of d
    upper bounds — the AGMS-style estimator the optimizer tier runs
    BEFORE committing to a join strategy, off two 4 KB summaries and
    without touching either table again. Mergeable like the sketches
    themselves.
    """
    j = (
        cms_a.select("d", "bucket", F.col("c").alias("ca"))
        .join(
            cms_b.select("d", "bucket", F.col("c").alias("cb")),
            on=["d", "bucket"],
        )
        .groupBy("d")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
    )
    return j.agg(F.min("ip").cast("long").alias("join_card_estimate"))
