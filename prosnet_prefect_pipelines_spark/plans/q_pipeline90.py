"""Pipeline batch 90 (north-star extension): attribution & data
preparation — linear multi-touch attribution with exact remainder
assignment, bag-of-words signature dedup, price-ending audits, keyset
pagination equivalence, and group-wise min-max normalization.

Exactness discipline: attribution credits are integer micro splits
whose remainder goes deterministically to the last touch (credits sum
to exactly 1e6 per conversion); normalization is truncating micro over
integer ranges."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.model import read_events
from prosnet_prefect_pipelines_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# linear multi-touch attribution with exact remainder.

ATTR_SQL = """
WITH ev AS (
    SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
    WHERE user_id IS NOT NULL
),
conv AS (
    SELECT user_id, event_id AS conv_id, ts_us AS conv_ts FROM ev
    WHERE event_type = 'purchase'
),
touch AS (
    SELECT user_id, event_id AS touch_id, event_type AS channel, ts_us
    FROM ev WHERE event_type IN ('click', 'view')
),
paths AS (
    SELECT c.conv_id, t.touch_id, t.channel, t.ts_us,
           COUNT(*) OVER (PARTITION BY c.conv_id) AS n_touches,
           row_number() OVER (PARTITION BY c.conv_id
                              ORDER BY t.ts_us DESC, t.touch_id DESC) AS recency
    FROM conv c JOIN touch t
      ON t.user_id = c.user_id
     AND t.ts_us < c.conv_ts AND c.conv_ts - t.ts_us <= 86400000000
),
credits AS (
    -- equal split in micro; the division remainder goes to the LAST
    -- (most recent) touch so credits per conversion sum to exactly 1e6
    SELECT channel,
           1000000 // n_touches
           + CASE WHEN recency = 1 THEN 1000000 % n_touches ELSE 0 END
               AS credit_micro
    FROM paths
)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(credit_micro) AS BIGINT) AS credit_micro_total
FROM credits GROUP BY channel
"""


@register("attribution_linear_remainder", oracle=ATTR_SQL, covers=["J1", "A2", "O6"])
def q_attribution_linear_remainder(spark, sf_dir):
    """Linear multi-touch attribution, exactly: each purchase's credit
    splits equally (integer micro) across its prior-24h click/view
    touches, and the division REMAINDER goes to the most recent touch —
    so every conversion's credits sum to exactly 1,000,000 (asserted in
    pytest; naive float splits leak credit). Touch paths come from one
    user-keyed join; per-conversion windows are bounded by the
    attribution horizon."""
    ev = read_events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("conv_id"), F.col("ts_us").alias("conv_ts")
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"),
        "ts_us",
    )
    paths = (
        conv.join(touch, "user_id")
        .filter(
            (F.col("ts_us") < F.col("conv_ts"))
            & (F.col("conv_ts") - F.col("ts_us") <= 86_400_000_000)
        )
        .select("conv_id", "touch_id", "channel", "ts_us")
    )
    wn = Window.partitionBy("conv_id")
    wr = Window.partitionBy("conv_id").orderBy(
        F.col("ts_us").desc(), F.col("touch_id").desc()
    )
    credits = paths.select(
        "channel",
        F.count(F.lit(1)).over(wn).alias("n_touches"),
        F.row_number().over(wr).alias("recency"),
    ).select(
        "channel",
        (
            F.expr("1000000 div n_touches")
            + F.when(F.col("recency") == 1, F.expr("1000000 % n_touches"))
            .otherwise(0)
        ).alias("credit_micro"),
    )
    return credits.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.sum("credit_micro").cast("long").alias("credit_micro_total"),
    )


# ---------------------------------------------------------------------------
# bag-of-words signature dedup (order-invariant exact dup).

BOW_SQL = """
WITH toks AS (
    SELECT doc_id,
           list_sort(list_distinct(
               list_filter(string_split_regex(trim(text), '\\s+'),
                           t -> t <> ''))) AS bag
    FROM documents WHERE text IS NOT NULL
),
sig AS (SELECT doc_id, md5(array_to_string(bag, ' ')) AS bow_sig FROM toks),
g AS (
    SELECT bow_sig, COUNT(*) AS n_docs, MIN(doc_id) AS keeper
    FROM sig GROUP BY bow_sig
)
SELECT bow_sig, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(keeper AS BIGINT) AS keeper
FROM g WHERE n_docs >= 2
"""


@register("dedup_bow_signature", oracle=BOW_SQL, covers=["A2", "P2"])
def q_dedup_bow_signature(spark, sf_dir):
    """Bag-of-words signature dedup: documents sharing the SAME sorted
    distinct-token set collapse to one keeper — the order-invariant
    exact-dup layer that catches shuffled/reordered paraphrases the
    byte-hash dedup misses (and the n-gram tiers pay real work for).
    One per-row canonicalization expression + a signature-keyed
    rollup."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    bag = F.array_sort(
        F.array_distinct(
            F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
        )
    )
    sig = docs.select(
        "doc_id", F.md5(F.array_join(bag, " ")).alias("bow_sig")
    )
    g = sig.groupBy("bow_sig").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper")
    )
    return g.filter(F.col("n_docs") >= 2).select(
        "bow_sig",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("keeper").cast("long").alias("keeper"),
    )


# ---------------------------------------------------------------------------
# price-endings audit.

ENDINGS_SQL = """
WITH p AS (
    SELECT CAST(round(l_extendedprice * 100) AS BIGINT) % 100 AS ending,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
    FROM lineitem
),
tot AS (SELECT COUNT(*) AS t FROM p)
SELECT CAST(ending AS BIGINT) AS ending,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(COUNT(*) AS HUGEINT) * 1000000 // t.t AS BIGINT) AS share_ppm
FROM p CROSS JOIN tot t
GROUP BY ending, t.t
HAVING COUNT(*) >= 50
"""


@register("price_endings_audit", oracle=ENDINGS_SQL, covers=["A2"])
def q_price_endings_audit(spark, sf_dir):
    """Price-ending distribution: cent endings (value mod 100) with ppm
    shares — the psychological-pricing audit (a spike at .99/.95
    reveals charm pricing; a uniform spread reveals synthetic or
    cost-plus data). One narrow pass + a 100-key rollup; min-count 50
    prunes noise."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = li.select(
        (F.round(F.col("l_extendedprice") * 100).cast("long") % 100).alias(
            "ending"
        )
    )
    tot = p.agg(F.count(F.lit(1)).alias("t"))
    return (
        p.groupBy("ending")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 50)
        .join(F.broadcast(tot))
        .select(
            F.col("ending").cast("long").alias("ending"),
            F.col("n").cast("long").alias("n"),
            F.expr(
                "CAST(CAST(n AS DECIMAL(38,0)) * 1000000 div t AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# keyset pagination equivalence.

KEYSET_SQL = """
WITH ordered AS (
    SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
offset_page AS (
    SELECT o_orderkey, cents FROM ordered
    ORDER BY o_orderkey LIMIT 20 OFFSET 40
),
cursor_ AS (
    -- the keyset cursor: the last key of page 2
    SELECT MAX(o_orderkey) AS last_key FROM (
        SELECT o_orderkey FROM ordered ORDER BY o_orderkey LIMIT 40
    ) t
),
keyset_page AS (
    SELECT o.o_orderkey, o.cents FROM ordered o CROSS JOIN cursor_ c
    WHERE o.o_orderkey > c.last_key
    ORDER BY o.o_orderkey LIMIT 20
)
SELECT 'offset' AS method, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(o_orderkey) AS BIGINT) AS first_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS last_key,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM offset_page
UNION ALL
SELECT 'keyset', CAST(COUNT(*) AS BIGINT), CAST(MIN(o_orderkey) AS BIGINT),
       CAST(MAX(o_orderkey) AS BIGINT), CAST(SUM(cents) AS BIGINT)
FROM keyset_page
"""


@register("keyset_pagination_equivalence", oracle=KEYSET_SQL, covers=["O2", "O1"])
def q_keyset_pagination_equivalence(spark, sf_dir):
    """Keyset (cursor) pagination proven equivalent to OFFSET: page 3
    (rows 41-60 by key) fetched both ways — identical membership
    summarized per method. OFFSET must scan-and-discard 40 rows;
    keyset seeks past the cursor (WHERE key > last_key LIMIT n), the
    only pagination that stays O(page) at 100 TB — this query is the
    correctness certificate for switching."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    page_offset = (
        o.orderBy("o_orderkey").offset(40).limit(20)
    )
    cursor_ = (
        o.orderBy("o_orderkey").limit(40).agg(F.max("o_orderkey").alias("last_key"))
    )
    page_keyset = (
        o.join(F.broadcast(cursor_))
        .filter(F.col("o_orderkey") > F.col("last_key"))
        .orderBy("o_orderkey")
        .limit(20)
        .select("o_orderkey", "cents")
    )

    def summarize(df, method):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("o_orderkey").cast("long").alias("first_key"),
            F.max("o_orderkey").cast("long").alias("last_key"),
            F.sum("cents").cast("long").alias("cents"),
        ).select(F.lit(method).alias("method"), "n", "first_key", "last_key", "cents")

    return summarize(page_offset.select("o_orderkey", "cents"), "offset").unionByName(
        summarize(page_keyset, "keyset")
    )


# ---------------------------------------------------------------------------
# group-wise min-max normalization.

MINMAX_SQL = """
WITH pts AS (
    SELECT l_suppkey % 10 AS grp, l_orderkey, l_linenumber, l_partkey,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS v
    FROM lineitem
),
stats AS (
    SELECT grp, MIN(v) AS lo, MAX(v) AS hi FROM pts GROUP BY grp
),
normed AS (
    SELECT p.grp,
           CASE WHEN s.hi > s.lo
                THEN CAST((p.v - s.lo) AS HUGEINT) * 1000000 // (s.hi - s.lo)
                ELSE 0 END AS norm_micro
    FROM pts p JOIN stats s USING (grp)
)
SELECT CAST(grp AS BIGINT) AS grp,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN norm_micro = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_at_min,
       CAST(SUM(CASE WHEN norm_micro = 1000000 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_at_max,
       CAST(SUM(norm_micro) // COUNT(*) AS BIGINT) AS mean_norm_micro
FROM normed GROUP BY grp
"""


@register("normalize_minmax_groups", oracle=MINMAX_SQL, covers=["A2", "J1"])
def q_normalize_minmax_groups(spark, sf_dir):
    """Group-wise min-max normalization: (v - min) / (max - min) in
    truncating micro per group — the feature-scaling transform, with
    the degenerate constant-group case pinned to 0. Group stats
    broadcast back; the report counts endpoint hits and the mean
    normalized level (summed exactly before one division)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pts = li.select(
        (F.col("l_suppkey") % 10).alias("grp"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
    )
    stats = pts.groupBy("grp").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    normed = pts.join(F.broadcast(stats), "grp").select(
        "grp",
        F.expr(
            "CASE WHEN hi > lo THEN CAST((v - lo) AS DECIMAL(38,0)) * 1000000 "
            "div (hi - lo) ELSE 0 END"
        ).alias("norm_micro"),
    )
    return normed.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("norm_micro") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_at_min"),
        F.sum(F.when(F.col("norm_micro") == 1_000_000, 1).otherwise(0))
        .cast("long")
        .alias("n_at_max"),
        F.expr(
            "CAST(SUM(norm_micro) div COUNT(1) AS BIGINT)"
        ).alias("mean_norm_micro"),
    ).select(F.col("grp").cast("long").alias("grp"), "n", "n_at_min", "n_at_max", "mean_norm_micro")
