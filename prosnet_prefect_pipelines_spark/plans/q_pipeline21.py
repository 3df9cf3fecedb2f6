"""Pipeline batch 21 (north-star extension): item-item cosine
(collaborative filtering), a positional postings index, phrase search
over it, and the deterministic Poisson bootstrap — each hash-matched
against a DuckDB twin.

Determinism: co-occurrence counts are integers; cosines are one sqrt
chain rounded at 6 dp; bootstrap replicate weights come from the
portable hash through a hard-coded Poisson inverse-CDF table, so every
"resample" is a pure function of (event_id, replicate).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register

# --- item-item cosine --------------------------------------------------------------------

ITEM_COSINE_SQL = """
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey % 40 AS item FROM lineitem
),
deg AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n FROM items GROUP BY item),
co AS (
    SELECT x.item AS i1, y.item AS i2, CAST(COUNT(*) AS BIGINT) AS co
    FROM items x JOIN items y ON x.l_orderkey = y.l_orderkey AND x.item < y.item
    GROUP BY x.item, y.item
)
SELECT i1, i2, co,
       round(co / (sqrt(d1.n) * sqrt(d2.n)), 6) AS cosine
FROM co JOIN deg d1 ON co.i1 = d1.item JOIN deg d2 ON co.i2 = d2.item
WHERE round(co / (sqrt(d1.n) * sqrt(d2.n)), 6) >= 0.1
"""


@register("item_cosine", oracle=ITEM_COSINE_SQL, covers=["J1", "A2"])
def q_item_cosine(spark, sf_dir):
    """Item-item cosine over binary basket vectors (the classic
    collaborative-filtering similarity): co-occurrence counts from the
    basket-keyed self-join, normalized by item degrees joined back
    (broadcast — the item vocabulary is dimension-sized). Candidate
    pairs exist only where items actually co-occur; never |I|^2."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    items = li.select("l_orderkey", (F.col("l_partkey") % 40).alias("item")).distinct()
    deg = items.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    co = (
        items.alias("x")
        .join(items.alias("y"), on="l_orderkey")
        .filter(F.col("x.item") < F.col("y.item"))
        .groupBy(F.col("x.item").alias("i1"), F.col("y.item").alias("i2"))
        .agg(F.count(F.lit(1)).alias("co"))
    )
    cos = (
        co.join(F.broadcast(deg.withColumnRenamed("item", "i1").withColumnRenamed("n", "n1")), on="i1")
        .join(F.broadcast(deg.withColumnRenamed("item", "i2").withColumnRenamed("n", "n2")), on="i2")
        .withColumn(
            "cosine", F.round(F.col("co") / (F.sqrt("n1") * F.sqrt("n2")), 6)
        )
    )
    return cos.filter(F.col("cosine") >= 0.1).select("i1", "i2", "co", "cosine")


# --- positional postings index -----------------------------------------------------------

POSTINGS_SQL = """
WITH toks AS (
    SELECT doc_id, t.tok, CAST(t.pos AS BIGINT) AS pos
    FROM documents,
         LATERAL (
             SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok,
                    unnest(generate_series(1, len(string_split_regex(trim(text), '\\s+')))) AS pos
         ) t
    WHERE t.tok <> ''
),
terms AS (
    SELECT tok,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
           CAST(COUNT(*) AS BIGINT) AS tf_total
    FROM toks GROUP BY tok
)
SELECT tok, df, tf_total FROM terms WHERE df >= 100
"""


@register("postings_index", oracle=POSTINGS_SQL, covers=["A1", "A2"])
def q_postings_index(spark, sf_dir):
    """Inverted-index term statistics from a positional explode (the
    build pass of a search index): document frequency + total term
    frequency per term, thresholded to the index's stop-list candidates.
    posexplode keeps positions for the phrase-search pass; shuffles key
    on the term."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos0", "tok")
    ).filter(F.col("tok") != "").select(
        "doc_id", "tok", (F.col("pos0") + 1).cast("long").alias("pos")
    )
    terms = toks.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count(F.lit(1)).alias("tf_total"),
    )
    return terms.filter(F.col("df") >= 100)


# --- positional phrase search ------------------------------------------------------------

PHRASE_SQL = """
WITH toks AS (
    SELECT doc_id, t.tok, CAST(t.pos AS BIGINT) AS pos
    FROM documents,
         LATERAL (
             SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok,
                    unnest(generate_series(1, len(string_split_regex(trim(text), '\\s+')))) AS pos
         ) t
    WHERE t.tok <> ''
),
w1 AS (SELECT doc_id, pos FROM toks WHERE tok = 'table'),
w2 AS (SELECT doc_id, pos FROM toks WHERE tok = 'hash')
SELECT w1.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM w1 JOIN w2 ON w1.doc_id = w2.doc_id AND w2.pos = w1.pos + 1
GROUP BY w1.doc_id
"""


@register("phrase_search", oracle=PHRASE_SQL, covers=["J1", "A2"])
def q_phrase_search(spark, sf_dir):
    """Exact phrase search ("table hash") over the positional
    postings: per-term posting lists equi-join on (doc, adjacent
    position) — the IR-engine phrase operator as relational algebra.
    Postings are term-filtered BEFORE the join, so only the two query
    terms' postings move."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos0", "tok")
    ).filter(F.col("tok") != "").select(
        "doc_id", "tok", (F.col("pos0") + 1).cast("long").alias("pos")
    )
    w1 = toks.filter(F.col("tok") == "table").select("doc_id", "pos")
    w2 = toks.filter(F.col("tok") == "hash").select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    return (
        w1.join(w2, on=["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


# --- deterministic Poisson bootstrap -----------------------------------------------------

# inverse CDF of Poisson(1), cumulative thresholds scaled to the 48-bit
# hash space (hard-coded identically in both engines)
_POIS_CUM = []
_c = 0.0
for _k in range(5):
    _c += math.exp(-1) / math.factorial(_k)
    _POIS_CUM.append(int(_c * (1 << 48)))

_POIS_CASE = (
    f"CASE WHEN h < {_POIS_CUM[0]} THEN 0 "
    + " ".join(
        f"WHEN h < {t} THEN {k + 1}" for k, t in enumerate(_POIS_CUM[1:])
    )
    + " ELSE 5 END"
)

_B = 16  # replicates


def _hash48_sql(key_expr: str, salt: str = "") -> str:
    h = f"md5(CAST({key_expr} AS VARCHAR) || '{salt}')"
    return (
        "list_sum(list_transform(generate_series(1, 12), i -> "
        f"CAST(strpos('0123456789abcdef', substr({h}, i, 1)) - 1 AS BIGINT)"
        " * CAST(power(16, 12 - i) AS BIGINT)))"
    )


BOOTSTRAP_SQL = f"""
WITH reps AS (SELECT unnest(generate_series(0, {_B - 1})) AS rep),
weighted AS (
    SELECT rep,
           CAST({_hash48_sql("event_id || '-' || rep", 'boot')} AS BIGINT) AS h,
           CAST(round(value * 1000000, 0) AS BIGINT) AS v
    FROM events CROSS JOIN reps
    WHERE event_type = 'purchase'
),
w AS (SELECT rep, ({_POIS_CASE}) AS wgt, v FROM weighted)
SELECT rep,
       CAST(SUM(wgt) AS BIGINT) AS n_resampled,
       CAST(SUM(wgt * v) AS BIGINT) AS sum_scaled,
       CAST(SUM(wgt * v) // greatest(SUM(wgt), 1) AS BIGINT) AS mean_scaled
FROM w GROUP BY rep
"""


@register("bootstrap_ci_poisson", oracle=BOOTSTRAP_SQL, covers=["A2"])
def q_bootstrap_ci_poisson(spark, sf_dir):
    """Poisson bootstrap (the distributed bootstrap: each replicate
    re-weights every row by an independent Poisson(1) draw instead of
    resampling, so replicates are ONE pass over the data with no
    shuffle of membership lists) — derandomized through the portable
    hash, so every replicate is reproducible. 16 replicate means of
    purchase value, integer-scaled; the spread estimates the CI."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    reps = spark.range(_B).select(F.col("id").alias("rep"))
    base = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.round(F.col("value") * 1000000, 0).cast("long").alias("v")
    )
    weighted = base.crossJoin(F.broadcast(reps)).select(
        "rep",
        "v",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_id").cast("string"),
                        F.lit("-"),
                        F.col("rep").cast("string"),
                        F.lit("boot"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long").alias("h"),
    )
    wgt = F.when(F.col("h") < _POIS_CUM[0], 0)
    for k, t in enumerate(_POIS_CUM[1:]):
        wgt = wgt.when(F.col("h") < t, k + 1)
    wgt = wgt.otherwise(5)
    w = weighted.select("rep", wgt.alias("wgt"), "v")
    return w.groupBy("rep").agg(
        F.sum("wgt").alias("n_resampled"),
        F.sum(F.col("wgt") * F.col("v")).alias("sum_scaled"),
        F.expr("sum(wgt * v) div greatest(sum(wgt), 1)").alias("mean_scaled"),
    )
