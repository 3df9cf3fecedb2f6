"""Pipeline batch 74 (north-star extension): tabular feature
engineering — leave-one-out target encoding, rare-category collapsing,
hashed feature crosses, per-entity lag features, and sparse one-hot
encoding.

The feature-store transforms a tabular-ML pipeline runs before
training. Exactness discipline: encodings are truncating integer micro
ratios; hash buckets are portable md5; vocabulary indexes are
dense_rank over a sorted bounded vocabulary."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.model import read_events
from prosnet_prefect_pipelines_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# leave-one-out target encoding.

LOO_SQL = """
WITH rows_ AS (
    SELECT o_orderkey, o_orderpriority AS cat,
           CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS y
    FROM orders
),
g AS (SELECT cat, COUNT(*) AS n, SUM(y) AS s FROM rows_ GROUP BY cat)
SELECT r.o_orderkey, r.cat, CAST(r.y AS INT) AS y,
       CAST(CASE WHEN g.n > 1
                 THEN CAST((g.s - r.y) AS HUGEINT) * 1000000 // (g.n - 1)
            END AS BIGINT) AS loo_enc_micro
FROM rows_ r JOIN g USING (cat)
"""


@register("loo_target_encoding", oracle=LOO_SQL, covers=["A2", "J1"])
def q_loo_target_encoding(spark, sf_dir):
    """Leave-one-out target encoding: each row's category encoded as
    the target mean of all OTHER rows in its category — (sum - y)/(n-1)
    in truncating micro — the leakage-safe variant of mean encoding
    (plain mean encoding leaks each row's own label into its feature).
    One category rollup broadcast back; singleton categories yield
    NULL."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rows_ = o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("cat"),
        F.when(F.col("o_totalprice") > 150000, 1).otherwise(0).alias("y"),
    )
    g = rows_.groupBy("cat").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    return rows_.join(F.broadcast(g), "cat").select(
        "o_orderkey",
        "cat",
        F.col("y").cast("int").alias("y"),
        F.expr(
            "CAST(CASE WHEN n > 1 THEN CAST((s - y) AS DECIMAL(38,0)) * 1000000"
            " div (n - 1) END AS BIGINT)"
        ).alias("loo_enc_micro"),
    )


# ---------------------------------------------------------------------------
# rare-category collapsing.

COLLAPSE_SQL = """
WITH src AS (
    SELECT p_partkey, p_brand AS cat FROM part
),
g AS (SELECT cat, COUNT(*) AS n FROM src GROUP BY cat),
mapped AS (
    SELECT s.p_partkey,
           CASE WHEN g.n >= 20 THEN s.cat ELSE '__other__' END AS cat_out
    FROM src s JOIN g USING (cat)
)
SELECT cat_out, CAST(COUNT(*) AS BIGINT) AS n
FROM mapped GROUP BY cat_out
"""


@register("category_collapse_encoding", oracle=COLLAPSE_SQL, covers=["A2", "P4"])
def q_category_collapse_encoding(spark, sf_dir):
    """Rare-category collapsing: brands below min-count 20 fold into
    '__other__' — the cardinality guard every categorical encoder
    applies so one-hot/hash features stay bounded and unseen-at-serving
    categories have a home. Count table broadcast back; output is the
    collapsed histogram."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    src = p.select("p_partkey", F.col("p_brand").alias("cat"))
    g = src.groupBy("cat").agg(F.count(F.lit(1)).alias("n"))
    mapped = src.join(F.broadcast(g), "cat").select(
        F.when(F.col("n") >= 20, F.col("cat"))
        .otherwise("__other__")
        .alias("cat_out")
    )
    return mapped.groupBy("cat_out").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


# ---------------------------------------------------------------------------
# hashed feature cross.

CROSS_SQL = """
WITH src AS (
    SELECT o_orderkey, o_orderpriority AS a,
           CAST(o_custkey % 10 AS VARCHAR) AS b
    FROM orders
),
h AS (
    SELECT o_orderkey, a, b,
           list_sum(list_transform(generate_series(1, 12), i ->
               CAST(strpos('0123456789abcdef',
                           substr(md5(a || 'x' || b), i, 1)) - 1 AS BIGINT)
               * CAST(power(16, 12 - i) AS BIGINT))) % 64 AS bucket
    FROM src
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT a || 'x' || b) AS BIGINT) AS n_distinct_crosses
FROM h GROUP BY bucket
"""


@register("hashed_feature_cross", oracle=CROSS_SQL, covers=["A1", "A2", "F15"])
def q_hashed_feature_cross(spark, sf_dir):
    """Hashed feature cross: (priority x customer-mod) crossed into 64
    hash buckets via the portable 48-bit md5 prefix — the
    collision-accepting trick that keeps A x B cross features bounded
    regardless of cardinality. Reports per-bucket load and distinct
    crosses (the collision audit). Pure per-row hashing + one rollup."""
    from prosnet_prefect_pipelines_spark.operators.dedup import portable_id

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    src = o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("a"),
        (F.col("o_custkey") % 10).cast("string").alias("b"),
    )
    cross = F.concat(F.col("a"), F.lit("x"), F.col("b"))
    h = src.select(
        cross.alias("cross"), (portable_id(cross) % 64).alias("bucket")
    )
    return h.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("cross").cast("long").alias("n_distinct_crosses"),
    ).select(F.col("bucket").cast("long").alias("bucket"), "n", "n_distinct_crosses")


# ---------------------------------------------------------------------------
# per-entity lag features.

LAG_FEATURES_SQL = """
WITH ev AS (
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events WHERE user_id IS NOT NULL AND event_type = 'purchase'
)
SELECT user_id, event_id,
       CAST(cents AS BIGINT) AS cents,
       CAST(lag(cents, 1) OVER w AS BIGINT) AS lag1_cents,
       CAST(lag(cents, 2) OVER w AS BIGINT) AS lag2_cents,
       CAST(CASE WHEN row_number() OVER w >= 3 THEN
            (cents + lag(cents, 1) OVER w + lag(cents, 2) OVER w) // 3 END
            AS BIGINT) AS rolling3_mean_cents
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
"""


@register("lag_feature_table", oracle=LAG_FEATURES_SQL, covers=["O1", "A2"])
def q_lag_feature_table(spark, sf_dir):
    """Per-user lag features: previous two purchase amounts and the
    trailing-3 truncating mean, exact cents — the feature-store lag
    block every churn/propensity model consumes. One user-keyed window,
    the rolling mean defined only once 3 points exist (no partial-
    window leakage)."""
    ev = read_events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & (F.col("event_type") == "purchase")
    ).select(
        "user_id",
        "event_id",
        "ts_us",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.col("cents").cast("long").alias("cents"),
        F.lag("cents", 1).over(w).cast("long").alias("lag1_cents"),
        F.lag("cents", 2).over(w).cast("long").alias("lag2_cents"),
        F.when(
            F.row_number().over(w) >= 3,
            F.expr(
                "CAST((cents + lag(cents, 1) OVER (PARTITION BY user_id "
                "ORDER BY ts_us, event_id) + lag(cents, 2) OVER (PARTITION BY "
                "user_id ORDER BY ts_us, event_id)) div 3 AS BIGINT)"
            ),
        ).alias("rolling3_mean_cents"),
    )


# ---------------------------------------------------------------------------
# sparse one-hot encoding.

ONEHOT_SQL = """
WITH vocab AS (
    SELECT cat, CAST(row_number() OVER (ORDER BY cat) - 1 AS BIGINT) AS idx
    FROM (SELECT DISTINCT o_orderpriority AS cat FROM orders) t
)
SELECT o.o_orderkey, v.idx AS feature_idx, CAST(1 AS INT) AS value
FROM orders o JOIN vocab v ON v.cat = o.o_orderpriority
"""


@register("onehot_sparse_encode", oracle=ONEHOT_SQL, covers=["J1", "P1"])
def q_onehot_sparse_encode(spark, sf_dir):
    """Sparse one-hot encoding: the category vocabulary indexed by
    sorted order (a bounded dimension — the only place a global
    row_number runs), then every row emitted as its (row, feature_idx,
    1) triplet — the COO sparse-matrix layout trainers ingest. The
    vocabulary broadcast-joins the fact table; nothing corpus-sized
    sorts."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    vocab = (
        o.select(F.col("o_orderpriority").alias("cat"))
        .distinct()
        .withColumn(
            "idx",
            (F.row_number().over(Window.orderBy("cat")) - 1).cast("long"),
        )
    )
    return o.join(
        F.broadcast(vocab), o["o_orderpriority"] == vocab["cat"]
    ).select(
        "o_orderkey",
        F.col("idx").alias("feature_idx"),
        F.lit(1).cast("int").alias("value"),
    )
