"""Deterministic sampling, splitting, and sequence packing for
training-data pipelines (north-star extension).

Every op here is keyed on a PORTABLE hash of a stable id — the 48-bit
md5-prefix family the dedup tier uses — instead of ``rand()``. That is
the property a training pipeline actually needs: membership of a row in
a sample / split is a pure function of its key, so reruns, engine swaps,
and incremental re-ingests never move rows between train and eval
(the leakage failure mode of seed-based sampling under repartitioning).

All ops are narrow Column expressions (no shuffle); ``pack_greedy`` adds
one window aggregation partitioned by the caller's shard key, so packing
parallelizes across shards and never forms a global single partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 2^48 — the md5-prefix hash is 12 hex digits
PORTABLE_DENOM = float(1 << 48)


def portable_fraction(key: Column, salt: str = "") -> Column:
    """Uniform [0,1) double from the 48-bit md5 prefix of ``key`` (+salt).

    Identical in every engine with md5 (DuckDB twin in plans/q_curation).
    ``salt`` derives independent draws from the same key — e.g. the
    sampling decision and the split assignment must not correlate.
    """
    s = F.concat(key.cast("string"), F.lit(salt))
    return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("double") / F.lit(
        PORTABLE_DENOM
    )


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows with hash-fraction <
    ``fraction``. Narrow filter — pushes to the scan, costs no shuffle,
    and keeps the same rows at any scale or partitioning."""
    return df.filter(portable_fraction(F.col(key_col), salt) < fraction)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (the ``sampleBy`` shape, made
    reproducible): each stratum keeps its own fraction; strata not in
    ``fractions`` keep ``default``. The fraction lookup is a literal
    CASE chain — no join, no shuffle."""
    frac: Column = F.lit(default)
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(stratum_col) == value, F.lit(f)).otherwise(frac)
    return df.filter(portable_fraction(F.col(key_col), salt) < frac)


def train_val_test(
    df: DataFrame,
    key_col: str,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
    salt: str = "split",
) -> DataFrame:
    """Append a ``split`` column ('train' | 'val' | 'test') keyed on the
    row id: u < test_frac -> test, < test_frac+val_frac -> val, else
    train. Key-pure, so a document can never migrate between splits
    across reruns or data growth — the train/eval-contamination guard."""
    u = portable_fraction(F.col(key_col), salt)
    return df.withColumn(
        "split",
        F.when(u < test_frac, F.lit("test"))
        .when(u < test_frac + val_frac, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def pack_greedy(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    size_col: str,
    budget: int,
    bin_col: str = "bin",
    offset_col: str = "bin_offset",
) -> DataFrame:
    """Concat-then-chunk sequence packing: within each shard, documents
    are laid out in ``order_col`` order and cut into bins of ``budget``
    size units (tokens); a document lands in the bin where its span
    starts (bins may overflow by at most one document, the standard
    streaming-concat packing approximation).

    Adds ``bin`` (0-based per shard) and ``bin_offset`` (start position
    within the bin). One window aggregation partitioned by shard — shards
    pack independently and in parallel, so the op scales with the shard
    count instead of forming a global ordering. Size shards so a shard's
    rows fit one task (e.g. hash-bucket the corpus id).
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("long")
    return df.withColumn(bin_col, F.floor(cum_before / budget)).withColumn(
        offset_col, cum_before % budget
    )


def weighted_sample_topk(
    df: DataFrame, key_col: str, weight_col: Column | str, k: int, salt: str = ""
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement via priority
    sampling (Duffield-Lund-Thorup): priority = weight / u with u the
    portable md5 uniform of the key; the k highest priorities are the
    sample. Inclusion probability is ~proportional to weight, membership
    is a pure function of (key, weight, salt) — reproducible across
    engines, reruns, and repartitionings, unlike rand()-based sampleBy.

    Priorities use one IEEE division (no ln/pow) so every engine
    computes bit-identical doubles; ranking ties break on the key.

    Scale: priorities are a narrow map; top-k is an
    ORDER BY ... LIMIT k, which Spark executes as per-partition
    TakeOrdered partials + a driver merge of k-row heaps — no global
    sort shuffle.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    pri = (w / portable_fraction(F.col(key_col), salt)).alias("priority")
    return (
        df.select("*", F.round(pri, 6).alias("priority"))
        .orderBy(F.col("priority").desc(), F.col(key_col))
        .limit(k)
    )
