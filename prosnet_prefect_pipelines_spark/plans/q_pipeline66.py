"""Pipeline batch 66 (north-star extension): corpus keywording and
exact-arithmetic business statistics — RAKE keyword extraction, exact
Pearson r² decomposition, day-over-day audience overlap, conversion
latency histograms, and market-concentration HHI.

Exactness discipline: RAKE scores are integer micro ratios; Pearson is
emitted as the cross-multiplied (sign, r² ppm) pair — no sqrt ever;
latencies and shares are truncating integer arithmetic end to end."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.model import read_events
from prosnet_prefect_pipelines_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# RAKE keyword extraction (Rose et al. 2010), integerized.

_STOP = (
    "the", "a", "an", "and", "of", "to", "in", "is", "for", "on", "with",
    "as", "at", "by", "it", "be", "or", "are", "was", "this", "that",
)
_STOP_SQL = ", ".join(f"'{w}'" for w in _STOP)

RAKE_SQL = f"""
WITH d AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS arr
    FROM documents WHERE text IS NOT NULL
),
toks AS (
    SELECT doc_id, u.p AS pos,
           regexp_replace(lower(u.w), '[^a-z]', '', 'g') AS w
    FROM d, unnest(list_transform(generate_series(1, len(arr)),
                                  i -> {{'p': i, 'w': arr[i]}})) t(u)
),
marked AS (
    SELECT doc_id, pos, w,
           CASE WHEN w = '' OR w IN ({_STOP_SQL}) THEN 1 ELSE 0 END AS stop
    FROM toks
),
numbered AS (
    SELECT doc_id, pos, w, stop,
           SUM(stop) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS UNBOUNDED PRECEDING) AS phrase_id
    FROM marked
),
phrases AS (
    SELECT doc_id, phrase_id,
           string_agg(w, ' ' ORDER BY pos) AS phrase,
           COUNT(*) AS n_words
    FROM numbered WHERE stop = 0
    GROUP BY doc_id, phrase_id
),
-- word stats count EVERY phrase occurrence...
words_all AS (
    SELECT p.phrase, p.n_words, t.u AS w
    FROM phrases p, unnest(string_split(p.phrase, ' ')) t(u)
),
wstats AS (
    SELECT w, COUNT(*) AS freq, SUM(n_words) AS degree FROM words_all GROUP BY w
),
-- ...but each DISTINCT phrase text is scored once (canonical RAKE)
pdistinct AS (SELECT phrase, MIN(n_words) AS n_words FROM phrases GROUP BY phrase),
pwords AS (
    SELECT p.phrase, p.n_words, t.u AS w
    FROM pdistinct p, unnest(string_split(p.phrase, ' ')) t(u)
),
pscore AS (
    SELECT pw.phrase, MIN(pw.n_words) AS n_words,
           SUM(CAST(ws.degree AS HUGEINT) * 1000000 // ws.freq) AS s
    FROM pwords pw JOIN wstats ws USING (w)
    GROUP BY pw.phrase
)
SELECT phrase, CAST(n_words AS BIGINT) AS n_words,
       CAST(s AS BIGINT) AS score_micro
FROM pscore ORDER BY s DESC, phrase LIMIT 15
"""


@register("rake_keywords", oracle=RAKE_SQL, covers=["A2", "O1", "P2"])
def q_rake_keywords(spark, sf_dir):
    """RAKE keyword extraction: candidate phrases are maximal runs of
    non-stopword tokens (lowercased, stripped to [a-z]); word score =
    degree/frequency in integer micro units (degree = summed length of
    phrases containing the word); phrase score = sum of member-word
    scores; global top-15 phrases by score.

    Scale shape: phrase construction is one per-doc window (running
    stopword count = phrase id — no UDF, no per-row Python); word stats
    are a vocabulary-sized aggregation joined back; the final top-15 is
    TakeOrdered. Everything integer, bit-identical across engines."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "term"),
    ).select(
        "doc_id",
        "pos",
        F.regexp_replace(F.lower(F.col("term")), "[^a-z]", "").alias("w"),
    )
    marked = toks.withColumn(
        "stop",
        F.when((F.col("w") == "") | F.col("w").isin(*_STOP), 1).otherwise(0),
    )
    wn = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    numbered = marked.withColumn("phrase_id", F.sum("stop").over(wn))
    phrases = (
        numbered.filter(F.col("stop") == 0)
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "w"))
                    ),
                    lambda s: s.getField("w"),
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).alias("n_words"),
        )
    )
    # word stats count EVERY phrase occurrence; each DISTINCT phrase
    # text is scored once (canonical RAKE)
    words_all = phrases.select(
        "phrase", "n_words", F.explode(F.split(F.col("phrase"), " ")).alias("w")
    )
    wstats = words_all.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("n_words").alias("degree")
    )
    pdistinct = phrases.groupBy("phrase").agg(F.min("n_words").alias("n_words"))
    pwords = pdistinct.select(
        "phrase", "n_words", F.explode(F.split(F.col("phrase"), " ")).alias("w")
    )
    pscore = (
        pwords.join(wstats, "w")
        .groupBy("phrase")
        .agg(
            F.min("n_words").alias("n_words"),
            F.sum(
                F.expr("CAST(degree AS DECIMAL(38,0)) * 1000000 div freq")
            ).alias("s"),
        )
    )
    return (
        pscore.orderBy(F.col("s").desc(), F.col("phrase"))
        .limit(15)
        .select(
            "phrase",
            F.col("n_words").cast("long").alias("n_words"),
            F.col("s").cast("long").alias("score_micro"),
        )
    )


# ---------------------------------------------------------------------------
# exact Pearson decomposition: sign + r² in ppm, zero floats.

PEARSON_SQL = """
WITH pts AS (
    SELECT l_suppkey % 25 AS grp,
           CAST(round(l_quantity) AS BIGINT) AS x,
           CAST(round(l_extendedprice) AS BIGINT) AS y
    FROM lineitem
),
s AS (
    SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n,
           CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
           CAST(SUM(x * y) AS HUGEINT) AS sxy,
           CAST(SUM(x * x) AS HUGEINT) AS sxx,
           CAST(SUM(y * y) AS HUGEINT) AS syy
    FROM pts GROUP BY grp
)
SELECT CAST(grp AS BIGINT) AS grp, CAST(n AS BIGINT) AS n,
       CAST(CASE WHEN n * sxy - sx * sy > 0 THEN 1
                 WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS INT) AS r_sign,
       CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) * 1000000
            // ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS BIGINT) AS r2_ppm
FROM s
"""


@register("pearson_r2_exact", oracle=PEARSON_SQL, covers=["A2"])
def q_pearson_r2_exact(spark, sf_dir):
    """Exact Pearson correlation per group, decomposed so no square
    root is ever taken: the sign of the covariance numerator plus
    r² = num² / (d_x * d_y) in truncating ppm — together they carry the
    full correlation (r = sign * sqrt(r²/1e6)) while staying in wide
    integer arithmetic end to end. One partial-aggregated stats pass,
    five sums per group, nothing else."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pts = li.select(
        (F.col("l_suppkey") % 25).alias("grp"),
        F.round(F.col("l_quantity")).cast("long").alias("x"),
        F.round(F.col("l_extendedprice")).cast("long").alias("y"),
    )
    d = "DECIMAL(38,0)"
    s = pts.groupBy("grp").agg(
        F.count(F.lit(1)).cast(d).alias("n"),
        F.sum("x").cast(d).alias("sx"),
        F.sum("y").cast(d).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(d).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(d).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast(d).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        F.col("grp").cast("long").alias("grp"),
        F.col("n").cast("long").alias("n"),
        F.when(num > 0, 1).when(num < 0, -1).otherwise(0).cast("int").alias("r_sign"),
        F.expr(
            "CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) * 1000000 div "
            "((n * sxx - sx * sx) * (n * syy - sy * sy)) AS BIGINT)"
        ).alias("r2_ppm"),
    )


# ---------------------------------------------------------------------------
# day-over-day active-audience overlap (Jaccard).

DAU_JACCARD_SQL = """
WITH ud AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
    FROM events WHERE user_id IS NOT NULL
),
days AS (SELECT DISTINCT day FROM ud),
consec AS (
    SELECT d1.day AS day, d2.day AS next_day
    FROM days d1 JOIN days d2 ON d2.day = d1.day + INTERVAL 1 DAY
),
inter AS (
    SELECT c.day, COUNT(*) AS n_both
    FROM consec c
    JOIN ud a ON a.day = c.day
    JOIN ud b ON b.day = c.next_day AND b.user_id = a.user_id
    GROUP BY c.day
),
sizes AS (SELECT day, COUNT(*) AS n FROM ud GROUP BY day)
SELECT CAST(c.day AS VARCHAR) AS day,
       CAST(sa.n AS BIGINT) AS dau,
       CAST(sb.n AS BIGINT) AS dau_next,
       CAST(COALESCE(i.n_both, 0) AS BIGINT) AS n_retained,
       CAST(CAST(COALESCE(i.n_both, 0) AS HUGEINT) * 1000000
            // (sa.n + sb.n - COALESCE(i.n_both, 0)) AS BIGINT) AS jaccard_ppm
FROM consec c
JOIN sizes sa ON sa.day = c.day
JOIN sizes sb ON sb.day = c.next_day
LEFT JOIN inter i ON i.day = c.day
"""


@register("dau_overlap_jaccard", oracle=DAU_JACCARD_SQL, covers=["A1", "J1", "J2"])
def q_dau_overlap_jaccard(spark, sf_dir):
    """Day-over-day audience overlap: Jaccard similarity (ppm) between
    consecutive days' active-user sets — the churn-vs-stickiness lens on
    the same (user, day) table the DAU/WAU rollups read. Set sizes and
    intersections are keyed counts off the deduplicated user-day pairs;
    only day pairs that BOTH exist appear (gap days break the chain)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("user_id").isNotNull()
    )
    ud = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    consec = (
        days.alias("d1")
        .join(
            days.alias("d2"),
            F.col("d2.day") == F.date_add(F.col("d1.day"), 1),
        )
        .select(F.col("d1.day").alias("day"), F.col("d2.day").alias("next_day"))
    )
    a = ud.select(F.col("day"), F.col("user_id"))
    b = ud.select(F.col("day").alias("next_day"), F.col("user_id"))
    inter = (
        consec.join(a, "day")
        .join(b, ["next_day", "user_id"])
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sizes = ud.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    sa = sizes.select(F.col("day"), F.col("n").alias("na"))
    sb = sizes.select(F.col("day").alias("next_day"), F.col("n").alias("nb"))
    return (
        consec.join(sa, "day")
        .join(sb, "next_day")
        .join(inter, "day", "left")
        .select(
            F.col("day").cast("string").alias("day"),
            F.col("na").cast("long").alias("dau"),
            F.col("nb").cast("long").alias("dau_next"),
            F.coalesce(F.col("n_both"), F.lit(0)).cast("long").alias("n_retained"),
            F.expr(
                "CAST(CAST(COALESCE(n_both, 0) AS DECIMAL(38,0)) * 1000000 "
                "div (na + nb - COALESCE(n_both, 0)) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# signup -> first purchase conversion latency histogram.

LATENCY_SQL = """
WITH ev AS (
    SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    WHERE user_id IS NOT NULL
),
s AS (SELECT user_id, MIN(ts_us) AS t0 FROM ev WHERE event_type = 'signup'
      GROUP BY user_id),
p AS (
    SELECT e.user_id, MIN(e.ts_us) AS t1
    FROM ev e JOIN s ON s.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND e.ts_us >= s.t0
    GROUP BY e.user_id
),
lat AS (
    SELECT s.user_id, p.t1 - s.t0 AS dt_us FROM s JOIN p USING (user_id)
),
b AS (
    SELECT CASE WHEN dt_us < 60000000 THEN '0_under_1m'
                WHEN dt_us < 3600000000 THEN '1_under_1h'
                WHEN dt_us < 86400000000 THEN '2_under_1d'
                ELSE '3_over_1d' END AS bucket,
           dt_us
    FROM lat
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(dt_us) AS BIGINT) AS min_dt_us,
       CAST(MAX(dt_us) AS BIGINT) AS max_dt_us
FROM b GROUP BY bucket
"""


@register("conversion_latency_histogram", oracle=LATENCY_SQL, covers=["A2", "J1"])
def q_conversion_latency_histogram(spark, sf_dir):
    """Signup-to-first-purchase latency distribution: for every user
    with a signup, the first purchase AT OR AFTER the first signup,
    bucketed <1m / <1h / <1d / >=1d in exact integer microseconds —
    the time-to-convert histogram growth reports plot. Two min-
    aggregations + one user-keyed join; purchases before the signup are
    excluded (re-activation noise)."""
    ev = read_events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts_us") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"), F.first("t0").alias("t0x"))
    )
    lat = p.select((F.col("t1") - F.col("t0x")).alias("dt_us"))
    bucket = (
        F.when(F.col("dt_us") < 60_000_000, "0_under_1m")
        .when(F.col("dt_us") < 3_600_000_000, "1_under_1h")
        .when(F.col("dt_us") < 86_400_000_000, "2_under_1d")
        .otherwise("3_over_1d")
    )
    return (
        lat.select(bucket.alias("bucket"), "dt_us")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("dt_us").cast("long").alias("min_dt_us"),
            F.max("dt_us").cast("long").alias("max_dt_us"),
        )
    )


# ---------------------------------------------------------------------------
# market concentration: Herfindahl-Hirschman index per nation.

HHI_SQL = """
WITH rev AS (
    SELECT s.s_nationkey AS nation, l.l_suppkey AS supp,
           SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cents
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY s.s_nationkey, l.l_suppkey
),
tot AS (SELECT nation, SUM(cents) AS t FROM rev GROUP BY nation),
shares AS (
    SELECT r.nation,
           CAST(CAST(r.cents AS HUGEINT) * 1000000 // t.t AS HUGEINT) AS share_ppm
    FROM rev r JOIN tot t USING (nation)
)
SELECT CAST(nation AS BIGINT) AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(MAX(share_ppm) AS BIGINT) AS top_share_ppm,
       CAST(SUM(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm
FROM shares GROUP BY nation
"""


@register("market_concentration_hhi", oracle=HHI_SQL, covers=["A2", "J1"])
def q_market_concentration_hhi(spark, sf_dir):
    """Herfindahl-Hirschman market-concentration index per nation:
    supplier revenue shares in truncating ppm, HHI = sum of squared
    shares scaled back to ppm (10^6 = monopoly) — the antitrust-style
    concentration metric over exact cent revenues. Supplier dimension
    broadcast into the revenue rollup; per-nation totals joined back on
    the nation key."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("l_suppkey"),
        F.col("s_nationkey").alias("nation"),
    )
    rev = (
        li.select(
            "l_suppkey",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
        .join(F.broadcast(sup), "l_suppkey")
        .groupBy("nation", "l_suppkey")
        .agg(F.sum("cents").alias("cents"))
    )
    tot = rev.groupBy("nation").agg(F.sum("cents").alias("t"))
    shares = rev.join(tot, "nation").select(
        "nation",
        F.expr(
            "CAST(CAST(cents AS DECIMAL(38,0)) * 1000000 div t AS DECIMAL(38,0))"
        ).alias("share_ppm"),
    )
    return shares.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.max("share_ppm").cast("long").alias("top_share_ppm"),
        F.expr(
            "CAST(SUM(share_ppm * share_ppm) div 1000000 AS BIGINT)"
        ).alias("hhi_ppm"),
    ).select(
        F.col("nation").cast("long").alias("nation"),
        "n_suppliers",
        "top_share_ppm",
        "hhi_ppm",
    )
