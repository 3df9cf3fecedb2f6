"""Training-data pipeline queries, batch 2 (north-star extension):
URL canonicalization + domain mixing, unigram-LM quality scoring,
vocabulary coverage, sequence pair mining, triangle counting, snapshot
reconciliation, and content checksums.

Inputs are derived deterministically in-query from the TPC-H/documents
tables (both engines build identical strings), the catalog convention.
All ratios are micro-unit integers via truncating ``div`` — exact on
every engine, no decimal-rounding-mode coupling.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators import audit as AU
from prosnet_prefect_pipelines_spark.operators import lm as LM
from prosnet_prefect_pipelines_spark.operators import sampling as SA
from prosnet_prefect_pipelines_spark.operators import temporal as TE
from prosnet_prefect_pipelines_spark.operators import web as W
from prosnet_prefect_pipelines_spark.operators.graph import triangle_count
from prosnet_prefect_pipelines_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# shared derivations

# deterministic URL corpus exercising every canonicalization rule:
# m=0 upper scheme/host + www + default port + trailing slash + utm + fragment
# m=1 non-default port kept, utm_ param dropped mid-query
# m=2 credentials + :80 + empty path
# m=3 plain ftp URL with trailing slash
# m=4 not a URL at all -> NULL canon
_URLS_CTE = """
urls AS (
    SELECT doc_id,
           doc_id % 5 AS m,
           CAST(doc_id % 7 AS VARCHAR) AS h,
           CAST(doc_id AS VARCHAR) AS i
    FROM documents
)
"""


def _spark_urls(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    h = (d % 7).cast("string")
    i = d.cast("string")
    url = (
        F.when(d % 5 == 0, F.concat(F.lit("HTTPS://WWW.Example"), h, F.lit(".COM:443/Path/"), i,
                                    F.lit("/?utm_source=x&id="), i, F.lit("#frag")))
        .when(d % 5 == 1, F.concat(F.lit("http://sub.site"), h, F.lit(".org:8080/a/b?id="), i,
                                   F.lit("&utm_campaign=z&ref=ok")))
        .when(d % 5 == 2, F.concat(F.lit("https://User@Host"), h, F.lit(".net:80")))
        .when(d % 5 == 3, F.concat(F.lit("ftp://files.data"), h, F.lit(".io/pub/")))
        .otherwise(F.concat(F.lit("not a url "), i))
    )
    return docs.select("doc_id", url.alias("url"))


# the oracle constructs the EXPECTED canonical forms per branch — an
# independent ground-truth derivation, not a SQL port of the parser
_EXPECTED_CTE = f"""
{_URLS_CTE},
expected AS (
    SELECT doc_id,
           CASE m
             WHEN 0 THEN 'https://example' || h || '.com/Path/' || i || '?id=' || i
             WHEN 1 THEN 'http://sub.site' || h || '.org:8080/a/b?id=' || i || '&ref=ok'
             WHEN 2 THEN 'https://host' || h || '.net/'
             WHEN 3 THEN 'ftp://files.data' || h || '.io/pub'
           END AS canon,
           CASE m
             WHEN 0 THEN 'www.example' || h || '.com'
             WHEN 1 THEN 'sub.site' || h || '.org'
             WHEN 2 THEN 'host' || h || '.net'
             WHEN 3 THEN 'files.data' || h || '.io'
           END AS host,
           CASE m
             WHEN 0 THEN 'example' || h || '.com'
             WHEN 1 THEN 'site' || h || '.org'
             WHEN 2 THEN 'host' || h || '.net'
             WHEN 3 THEN 'data' || h || '.io'
           END AS domain
    FROM urls
)
"""

URL_CANON_SQL = f"""
WITH {_EXPECTED_CTE}
SELECT doc_id, canon, host, domain FROM expected
"""


@register("url_canonicalize", oracle=URL_CANON_SQL, covers=["P2", "P7"])
def q_url_canonicalize(spark, sf_dir):
    """X-URL: scheme/host lowering, www + default-port + trailing-slash +
    tracking-param + fragment stripping; non-URLs -> NULL. Narrow regex
    Column expressions only — the whole query is one codegen stage."""
    urls = _spark_urls(spark, sf_dir)
    host = W.url_host(F.col("url"))
    return urls.select(
        "doc_id",
        W.canonicalize_url(F.col("url")).alias("canon"),
        host.alias("host"),
        W.registered_domain(host).alias("domain"),
    )


DOMAIN_STATS_SQL = f"""
WITH {_EXPECTED_CTE},
present AS (SELECT domain, canon FROM expected WHERE canon IS NOT NULL),
per AS (
    SELECT domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT canon) AS BIGINT) AS n_unique_urls
    FROM present GROUP BY domain
),
tot AS (SELECT SUM(n_docs) AS t FROM per)
SELECT domain, n_docs, n_unique_urls,
       CAST(CAST(n_docs AS HUGEINT) * 1000000 // t AS BIGINT) AS share_micro
FROM per, tot
"""


@register("url_domain_stats", oracle=DOMAIN_STATS_SQL, covers=["A1", "A2"])
def q_url_domain_stats(spark, sf_dir):
    """X-URL per-domain rollup: doc count, distinct canonical URLs, and
    corpus share (micro units). One shuffle on the domain key; the
    grand total is a broadcast single-row join, never a global window."""
    urls = _spark_urls(spark, sf_dir)
    canon = W.canonicalize_url(F.col("url"))
    present = urls.select(
        W.registered_domain(W.url_host(F.col("url"))).alias("domain"),
        canon.alias("canon"),
    ).filter(F.col("canon").isNotNull())
    per = present.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("canon").alias("n_unique_urls"),
    ).localCheckpoint(eager=False)  # tot derives from per: materialize once
    tot = per.agg(F.sum("n_docs").alias("t"))
    return per.join(F.broadcast(tot)).select(
        "domain",
        "n_docs",
        "n_unique_urls",
        F.expr("CAST(n_docs * 1000000 AS DECIMAL(38,0)) div t").alias("share_micro"),
    )


# ---------------------------------------------------------------------------
# unigram LM scoring + vocabulary coverage

UNIGRAM_SQL = """
WITH toks AS (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
    FROM documents
),
counts AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token)
SELECT t.doc_id AS id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(CAST(SUM(c) AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT)
           AS mean_token_freq_micro,
       CAST(CAST(SUM(CASE WHEN c <= 2 THEN 1 ELSE 0 END) AS HUGEINT) * 1000000
            // COUNT(*) AS BIGINT) AS rare_frac_micro
FROM toks t JOIN counts USING (token)
GROUP BY t.doc_id
"""


@register("unigram_lm_score", oracle=UNIGRAM_SQL, covers=["A2", "J1"])
def q_unigram_lm_score(spark, sf_dir):
    """X-LM-SCORE: per-doc unigram-frequency stats (the exact-arithmetic
    perplexity-proxy filter). Token-frequency table + one token-keyed
    join + one doc-keyed aggregation."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return LM.corpus_freq_score(docs, "doc_id", "text", rare_threshold=2)


VOCAB_SQL = """
WITH toks AS (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token FROM documents
),
counts AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
tot AS (SELECT SUM(c) AS t FROM counts),
top AS (SELECT token, c FROM counts ORDER BY c DESC, token LIMIT 40)
SELECT token, CAST(c AS BIGINT) AS c,
       CAST(CAST(SUM(c) OVER (ORDER BY c DESC, token
                              ROWS UNBOUNDED PRECEDING) AS HUGEINT)
            * 1000000 // t AS BIGINT) AS cum_share_micro
FROM top, tot
"""


@register("vocab_coverage", oracle=VOCAB_SQL, covers=["A2", "O1"])
def q_vocab_coverage(spark, sf_dir):
    """X-VOCAB: top-40 tokens with cumulative corpus coverage — the
    tokenizer-vocabulary sizing curve. The only single-partition window
    spans exactly the 40 survivors."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return LM.vocab_coverage(docs, "text", top_k=40)


QUALITY_CLS_SQL = """
WITH docs2 AS (
    SELECT doc_id,
           text || CASE doc_id % 4
               WHEN 0 THEN ' 123 456 99 99'
               WHEN 1 THEN ' spark spark spark'
               WHEN 2 THEN ' extraordinary vocabulary'
               ELSE '' END AS text
    FROM documents
),
feats AS (
    SELECT doc_id,
           string_split_regex(trim(text), '\\s+') AS l
    FROM docs2
),
scored AS (
    SELECT doc_id,
           CAST(len(l) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(l, t -> length(t) >= 5)) AS BIGINT) AS n_long,
           CAST(len(list_filter(l, t -> regexp_matches(t, '^[0-9]+$'))) AS BIGINT)
               AS n_digit,
           CAST(COALESCE(list_sum(list_transform(range(2, len(l) + 1),
               i -> CASE WHEN l[i] = l[i-1] THEN 1 ELSE 0 END)), 0) AS BIGINT)
               AS n_repeat
    FROM feats
)
SELECT doc_id,
       -2000 + 10 * n_tokens + 25 * n_long - 40 * n_digit - 30 * n_repeat AS score,
       CASE WHEN -2000 + 10 * n_tokens + 25 * n_long - 40 * n_digit - 30 * n_repeat >= 0
            THEN 'keep' ELSE 'drop' END AS label
FROM scored
"""


@register("quality_classifier", oracle=QUALITY_CLS_SQL, covers=["F21", "P7"])
def q_quality_classifier(spark, sf_dir):
    """X-QCLASS: integer-weighted linear quality gate (fasttext-shaped,
    exact arithmetic). Pure narrow Column expressions — the classifier
    costs one codegen pass over the corpus, no shuffle at all."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    text2 = F.concat(
        F.col("text"),
        F.when(d % 4 == 0, F.lit(" 123 456 99 99"))
        .when(d % 4 == 1, F.lit(" spark spark spark"))
        .when(d % 4 == 2, F.lit(" extraordinary vocabulary"))
        .otherwise(F.lit("")),
    )
    score = LM.linear_quality_score(text2)
    return docs.select(
        "doc_id",
        score.alias("score"),
        F.when(score >= 0, F.lit("keep")).otherwise(F.lit("drop")).alias("label"),
    )


# ---------------------------------------------------------------------------
# domain-mixture sampling

_FRAC_SQL = (
    "list_sum(list_transform(generate_series(1, 12), i -> "
    "CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || 'mix'), i, 1)) - 1 AS BIGINT)"
    " * CAST(power(16, 12 - i) AS BIGINT))) / 281474976710656.0"
)

MIXTURE_SQL = f"""
WITH per AS (
    SELECT source,
           CAST(1 + CAST(substr(source, 4, 10) AS INT) % 4 AS BIGINT) AS w,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM documents GROUP BY source
),
tot AS (SELECT SUM(w) AS tw, SUM(n) AS tn FROM per),
frac AS (
    SELECT source, n,
           least(1.0, CAST((tn // 2) * w AS DOUBLE) / CAST(tw * n AS DOUBLE)) AS f
    FROM per, tot
),
kept AS (
    SELECT d.source, COUNT(*) AS n_kept
    FROM documents d JOIN frac USING (source)
    WHERE {_FRAC_SQL} < f
    GROUP BY d.source
)
SELECT frac.source, frac.n AS n_before,
       CAST(COALESCE(kept.n_kept, 0) AS BIGINT) AS n_kept
FROM frac LEFT JOIN kept ON frac.source = kept.source
"""


@register("mixture_sample", oracle=MIXTURE_SQL, covers=["A2", "J2"])
def q_mixture_sample(spark, sf_dir):
    """X-MIXTURE: hit a target per-source mixture under a global budget.
    Per-source weight w_s -> target_n_s = (budget * w_s) / total_w;
    keep fraction min(1, target_n_s / n_s) applied with the key-pure
    portable hash, so the sample is deterministic at any scale and
    re-runs never swap documents. Fractions are a broadcast join; the
    membership test is a narrow filter."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).select(
        "source",
        "n",
        (1 + F.substring("source", 4, 10).cast("int") % 4).cast("long").alias("w"),
    ).localCheckpoint(eager=False)  # tot + frac both derive from per
    tot = per.agg(F.sum("w").alias("tw"), F.sum("n").alias("tn"))
    frac = per.join(F.broadcast(tot)).select(
        "source",
        "n",
        F.least(
            F.lit(1.0),
            (F.expr("tn div 2") * F.col("w")).cast("double")
            / (F.col("tw") * F.col("n")).cast("double"),
        ).alias("f"),
    )
    kept = (
        docs.join(F.broadcast(frac), on="source")
        .filter(SA.portable_fraction(F.col("doc_id"), "mix") < F.col("f"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return frac.join(kept, on="source", how="left").select(
        "source",
        F.col("n").alias("n_before"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# sequence pair mining

SEQ_PAIRS_SQL = """
WITH seq AS (
    SELECT user_id,
           event_type,
           lag(event_type, 3) OVER w AS t3,
           lag(event_type, 2) OVER w AS t2,
           lag(event_type, 1) OVER w AS t1
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id AS key,
       t3 || ' ' || t2 || ' ' || t1 AS context,
       event_type AS target
FROM seq WHERE t3 IS NOT NULL
"""


@register("sequence_context_pairs", oracle=SEQ_PAIRS_SQL, covers=["O1"])
def q_sequence_context_pairs(spark, sf_dir):
    """X-SEQ-PAIRS: (context, next-token) training pairs from per-user
    event streams — one keyed window pass, event_id tie-break for a
    total order."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return TE.context_target_pairs(
        events, "user_id", ["ts", "event_id"], "event_type", n_context=3
    )


# ---------------------------------------------------------------------------
# graph: triangle counting

TRIANGLES_SQL = """
WITH m AS (
    SELECT COUNT(*) // 10 + 1 AS m1, COUNT(*) // 10 + 3 AS m2 FROM orders
),
edges AS (
    -- two co-prime-ish moduli: endpoints are quasi-independent residues
    -- (one shared modulus would make v a function of u — a functional,
    -- triangle-free graph), and node count scales WITH the data so the
    -- graph keeps constant average degree at any sf
    SELECT o_orderkey % m1 AS u, o_orderkey % m2 AS v FROM orders, m
),
e AS (
    SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
    FROM edges WHERE u <> v
)
SELECT CAST(COUNT(*) AS BIGINT) AS triangles
FROM e e1
JOIN e e2 ON e2.a = e1.b
JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
"""


@register("triangle_count", oracle=TRIANGLES_SQL, covers=["J1", "A2"])
def q_triangle_count(spark, sf_dir):
    """X-TRIANGLES: degree-ordered global triangle count over an
    orders-derived graph. The oracle is the naive a<b<c triple-join; the
    engine's degree-ordered wedge enumeration must agree exactly."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()  # parquet metadata count — no data scan
    m1, m2 = n // 10 + 1, n // 10 + 3
    k = F.col("o_orderkey")
    edges = orders.select((k % m1).alias("src"), (k % m2).alias("dst"))
    return triangle_count(edges)


# ---------------------------------------------------------------------------
# snapshot reconciliation + content checksum

SNAPSHOT_DIFF_SQL = """
WITH old AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 <> 3),
     new AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 11 <> 5)
SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
       CASE WHEN old.o_orderkey IS NULL THEN 'added'
            WHEN new.o_orderkey IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
WHERE old.o_orderkey IS NULL
   OR new.o_orderkey IS NULL
   OR COALESCE(old.o_orderkey, new.o_orderkey) % 7 = 0
"""


@register("snapshot_diff", oracle=SNAPSHOT_DIFF_SQL, covers=["J2", "J7"])
def q_snapshot_diff(spark, sf_dir):
    """X-DIFF: keyed added/removed/changed between two snapshots. The
    engine compares 48-bit row fingerprints (16 bytes shuffled per row);
    the oracle derives the expected statuses from the synthetic edit
    pattern (%7 rows repriced, %10/%11 rows present on one side only) —
    an independent ground truth, not a hash re-implementation."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    old = orders.filter(k % 10 != 3).select(
        "o_orderkey", F.col("o_totalprice").alias("price"), "o_orderstatus"
    )
    new = orders.filter(k % 11 != 5).select(
        "o_orderkey",
        F.when(k % 7 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
        "o_orderstatus",
    )
    return AU.snapshot_diff(old, new, ["o_orderkey"], ["price", "o_orderstatus"])


_FP_SQL = (
    "list_sum(list_transform(generate_series(1, 12), i -> "
    "CAST(strpos('0123456789abcdef', substr(md5("
    "COALESCE(CAST(doc_id AS VARCHAR), chr(1) || 'null' || chr(1)) || chr(31) || "
    "COALESCE(text, chr(1) || 'null' || chr(1)) || chr(31) || "
    "COALESCE(lang, chr(1) || 'null' || chr(1))"
    "), i, 1)) - 1 AS BIGINT) * CAST(power(16, 12 - i) AS BIGINT)))"
)

CHECKSUM_SQL = f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST({_FP_SQL} AS HUGEINT)) AS VARCHAR) AS checksum
FROM documents
GROUP BY source
"""


@register("content_checksum", oracle=CHECKSUM_SQL, covers=["A2"])
def q_content_checksum(spark, sf_dir):
    """X-AUDIT: order-independent per-source content checksum any engine
    with md5 can recompute (the oracle recomputes it in DuckDB — that
    cross-engine agreement IS the feature under test)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return AU.content_checksum(docs, ["source"], ["doc_id", "text", "lang"])
