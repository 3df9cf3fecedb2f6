"""Pipeline batch 12 (north-star extension): strongly connected
components, priority-based weighted sampling, gaps-and-islands streaks,
interval-interval overlap join, and the signed hashing trick — each
hash-matched against a DuckDB twin.

Determinism: SCC labels are the max member (both engines); priorities
are one IEEE division over the portable md5 uniform (no transcendental
functions); islands/overlaps are pure integer arithmetic; hashing-trick
buckets/signs mirror the 48-bit md5 prefix digit-for-digit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators import aggregates as A
from prosnet_prefect_pipelines_spark.operators import graph as G
from prosnet_prefect_pipelines_spark.operators import sampling as SA
from prosnet_prefect_pipelines_spark.operators import temporal as T
from prosnet_prefect_pipelines_spark.operators import textstats as TS
from prosnet_prefect_pipelines_spark.plans.catalog import register

# --- strongly connected components -------------------------------------------------------

# 50 blocks of 8 nodes: each block is a directed cycle (one SCC), block
# heads chain upward (DAG edges between SCCs) — derived from orders keys
_SCC_NODES = 400
_SCC_BLOCK = 8

SCC_SQL = f"""
WITH RECURSIVE ks AS (
    SELECT DISTINCT o_orderkey % {_SCC_NODES} AS v FROM orders
),
e AS (
    SELECT lpad(CAST(v AS VARCHAR), 4, '0') AS a,
           lpad(CAST(v - (v % {_SCC_BLOCK}) + ((v % {_SCC_BLOCK}) + 1) % {_SCC_BLOCK}
                     AS VARCHAR), 4, '0') AS b
    FROM ks
    UNION ALL
    SELECT lpad(CAST(v AS VARCHAR), 4, '0'),
           lpad(CAST(v + {_SCC_BLOCK} AS VARCHAR), 4, '0')
    FROM ks WHERE v % {_SCC_BLOCK} = 0 AND v + {_SCC_BLOCK} < {_SCC_NODES}
),
nodes AS (
    SELECT DISTINCT n FROM (SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e) t
),
reach AS (
    SELECT a, b FROM e
    UNION
    SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a
),
mutual AS (
    SELECT r1.a AS x, r1.b AS y
    FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
),
m2 AS (SELECT x, MAX(y) AS my FROM mutual GROUP BY x)
SELECT n AS node, GREATEST(n, COALESCE(my, n)) AS scc
FROM nodes LEFT JOIN m2 ON nodes.n = m2.x
"""


@register("scc_components", oracle=SCC_SQL, covers=["J9", "J5"])
def q_scc_components(spark, sf_dir):
    """Directed strongly connected components over a cyclic graph (50
    8-cycles chained into a DAG of SCCs), labels = max member. Driver
    Tarjan below the broadcast threshold; Orzan's distributed coloring
    (forward max-ancestor fixpoint + backward root reachability + peel)
    above it — equivalence-tested in tests/test_pipeline12.py."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    v = F.col("v")
    ks = orders.select((F.col("o_orderkey") % _SCC_NODES).alias("v")).distinct()

    def pad(c):
        return F.lpad(c.cast("string"), 4, "0")

    cyc = ks.select(
        pad(v).alias("src"),
        pad(v - (v % _SCC_BLOCK) + ((v % _SCC_BLOCK) + 1) % _SCC_BLOCK).alias("dst"),
    )
    chain = ks.filter((v % _SCC_BLOCK == 0) & (v + _SCC_BLOCK < _SCC_NODES)).select(
        pad(v).alias("src"), pad(v + _SCC_BLOCK).alias("dst")
    )
    return G.scc_components(cyc.unionByName(chain))


# --- weighted sampling without replacement -----------------------------------------------


def _hash48_sql(key_expr: str, salt: str = "") -> str:
    """DuckDB twin of the 48-bit md5-prefix integer hash."""
    h = f"md5(CAST({key_expr} AS VARCHAR) || '{salt}')"
    return (
        "list_sum(list_transform(generate_series(1, 12), i -> "
        f"CAST(strpos('0123456789abcdef', substr({h}, i, 1)) - 1 AS BIGINT)"
        " * CAST(power(16, 12 - i) AS BIGINT)))"
    )


WEIGHTED_SAMPLE_SQL = f"""
SELECT doc_id, n_chars, priority FROM (
    SELECT doc_id, n_chars,
           round(n_chars / ({_hash48_sql('doc_id', 'ws')} / 281474976710656.0), 6)
               AS priority
    FROM documents
)
ORDER BY priority DESC, doc_id
LIMIT 50
"""


@register("weighted_sample_topk", oracle=WEIGHTED_SAMPLE_SQL, covers=["O1"])
def q_weighted_sample_topk(spark, sf_dir):
    """Deterministic weighted sampling without replacement (priority
    sampling, Duffield-Lund-Thorup): priority = weight / portable-md5
    uniform, top-50 kept. Inclusion odds ~proportional to document
    length; membership is a pure function of doc_id — reruns, engine
    swaps, and repartitioning keep the same sample. Executes as
    TakeOrdered partials + driver heap merge, not a global sort."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return SA.weighted_sample_topk(docs, "doc_id", "n_chars", k=50, salt="ws").select(
        "doc_id", "n_chars", "priority"
    )


# --- gaps-and-islands activity streaks ---------------------------------------------------

STREAKS_SQL = """
WITH days AS (
    SELECT DISTINCT user_id,
           CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
    FROM events
),
grp AS (
    SELECT user_id, day,
           day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS g
    FROM days
)
SELECT user_id,
       CAST(MIN(day) AS BIGINT) AS island_start,
       CAST(MAX(day) AS BIGINT) AS island_end,
       CAST(COUNT(*) AS BIGINT) AS island_len
FROM grp GROUP BY user_id, g
"""


@register("activity_streaks", oracle=STREAKS_SQL, covers=["A2", "O1"])
def q_activity_streaks(spark, sf_dir):
    """Per-user consecutive-active-day streaks (gaps-and-islands via the
    point-minus-row_number constant): the engagement/retention primitive.
    One window + one groupBy, both keyed on the user — series windowize
    independently; no global order."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    days = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long").alias("day"),
    )
    return A.islands(days, "user_id", "day")


# --- interval-interval overlap join ------------------------------------------------------

INTERVAL_OVERLAP_SQL = """
WITH a AS (
    SELECT o_orderkey AS a_key,
           CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS a_lo,
           CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               + o_orderkey % 5 AS a_hi
    FROM orders WHERE o_orderkey % 37 = 0
),
b AS (
    SELECT o_orderkey AS b_key,
           CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS b_lo,
           CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               + o_orderkey % 7 AS b_hi
    FROM orders WHERE o_orderkey % 41 = 1
)
SELECT a_key, b_key, a_lo, a_hi, b_lo, b_hi
FROM a JOIN b ON a_lo <= b_hi AND b_lo <= a_hi
"""


@register("interval_overlap", oracle=INTERVAL_OVERLAP_SQL, covers=["J1"])
def q_interval_overlap(spark, sf_dir):
    """Interval-interval overlap join (validity windows x maintenance
    windows) via bucket-grid equi-join + residual filter, pair-deduped
    by the canonical first-shared-bucket trick (no dedup shuffle) —
    extends range_join's point-in-interval to interval pairs. Work
    scales with bucket co-residency, never |A| x |B|."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).cast("long")
    a = orders.filter(F.col("o_orderkey") % 37 == 0).select(
        F.col("o_orderkey").alias("a_key"),
        day.alias("a_lo"),
        (day + F.col("o_orderkey") % 5).alias("a_hi"),
    )
    b = orders.filter(F.col("o_orderkey") % 41 == 1).select(
        F.col("o_orderkey").alias("b_key"),
        day.alias("b_lo"),
        (day + F.col("o_orderkey") % 7).alias("b_hi"),
    )
    return T.interval_overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=8).select(
        "a_key", "b_key", "a_lo", "a_hi", "b_lo", "b_hi"
    )


# --- signed hashing trick ----------------------------------------------------------------

FEATURE_HASHING_SQL = f"""
WITH toks AS (
    SELECT doc_id AS id, t.tok
    FROM documents, unnest(string_split_regex(trim(text), '\\s+')) t(tok)
    WHERE t.tok <> ''
),
hashed AS (
    SELECT id,
           CAST({_hash48_sql('tok', 'fh')} % 64 AS BIGINT) AS bucket,
           CASE WHEN substr(md5(CAST(tok AS VARCHAR) || 'fh'), 13, 1) < '8'
                THEN 1 ELSE -1 END AS s
    FROM toks
)
SELECT id, bucket, CAST(SUM(s) AS BIGINT) AS val
FROM hashed GROUP BY id, bucket
"""


@register("feature_hashing", oracle=FEATURE_HASHING_SQL, covers=["A2"])
def q_feature_hashing(spark, sf_dir):
    """Signed hashing trick (Weinberger et al.): vocabulary-free 64-dim
    sparse doc vectors — token -> md5-prefix bucket, +/-1 sign from an
    independent hash bit (unbiased collisions), signs summed per (doc,
    bucket). Explode + one groupBy, linear in corpus tokens."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return TS.feature_hashing(docs, "doc_id", "text", n_buckets=64, salt="fh")
