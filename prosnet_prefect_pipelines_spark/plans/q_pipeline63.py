"""Pipeline batch 63 (north-star extension): language-model-adjacent
text analytics and training-set shaping — bigram LM scoring, readability,
pseudo-relevance-feedback query expansion, class-balanced sampling plans,
and association rules with lift.

Exactness discipline (catalog conventions): every ratio is integer-
scaled (micro/ppm/milli units) computed with truncating integer
division in BOTH engines; ordering tie-breaks are pinned; the only
windows partition by bounded keys (doc id / class label).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# bigram LM score — the n=2 extension of unigram_lm_score: per-doc mean
# conditional bigram probability + rare-bigram fraction, all integer.

BIGRAM_SQL = """
WITH d AS (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '\\s+'),
                       t -> t <> '') AS arr
    FROM documents WHERE text IS NOT NULL
),
bg AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(arr) - 1),
                                 i -> arr[i] || ' ' || arr[i + 1])) AS bg
    FROM d WHERE len(arr) >= 2
),
c2 AS (SELECT bg, COUNT(*) AS c2 FROM bg GROUP BY bg),
c1 AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
scored AS (
    SELECT b.doc_id,
           CAST(CAST(c2.c2 AS HUGEINT) * 1000000 // c1.c1 AS BIGINT) AS p_micro,
           c2.c2 AS bc
    FROM bg b
    JOIN c2 ON c2.bg = b.bg
    JOIN c1 ON c1.w1 = split_part(b.bg, ' ', 1)
)
SELECT doc_id AS id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(CAST(SUM(p_micro) AS HUGEINT) // COUNT(*) AS BIGINT)
           AS mean_bigram_p_micro,
       CAST(CAST(SUM(CASE WHEN bc <= 2 THEN 1 ELSE 0 END) AS HUGEINT)
            * 1000000 // COUNT(*) AS BIGINT) AS rare_bigram_frac_micro
FROM scored GROUP BY doc_id
"""


@register("bigram_lm_score", oracle=BIGRAM_SQL, covers=["A2", "J1"])
def q_bigram_lm_score(spark, sf_dir):
    """Per-doc bigram LM statistics: mean conditional probability
    p(w2|w1) = c(w1 w2)/c(w1 ·) in micro units, plus the fraction of
    bigram occurrences whose corpus count <= 2 (the fluency/novelty
    signal a perplexity filter thresholds — rare-bigram-heavy docs are
    either creative or garbage).

    Scale shape: one explode per doc (token count work), two vocabulary-
    sized count tables joined back on the bigram/prefix key (map-side
    combinable aggregations, broadcastable at typical vocab sizes), one
    doc-keyed rollup. No floats anywhere — p and fractions are
    truncating integer divisions, bit-identical across engines.
    """
    # opt r11 (guide §2.4/§8): one corpus pass instead of three. The
    # original shape exploded the corpus once per aggregation branch
    # (c2, c1, scored — Spark replans shared lineage per branch), and
    # shuffled the occurrence-sized scored stream for the per-doc
    # rollup. Every decision only needs per-(doc, bigram) counts, so:
    # fan out BY doc_id (single-row-group scan would otherwise run the
    # explode single-task; doc_id is unique so the spread matches
    # round-robin), explode once, pre-aggregate to (id, bg, cnt) —
    # hashpartitioning(doc_id) satisfies the (id, bg) clustering, so no
    # exchange — and localCheckpoint that block (house idiom for
    # multi-consumer subtrees). c2/c1 are rollups of it and the final
    # per-doc rollup inherits the doc_id partitioning: the only
    # occurrence-sized work left in the plan is the single explode.
    spark_ctx = spark.sparkContext
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .repartition(spark_ctx.defaultParallelism, "doc_id")
    )
    toks = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != ""
    )
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        ),
    )
    bg = docs.select(
        F.col("doc_id").alias("id"), F.explode(bigrams).alias("bg")
    )
    # occurrences of the same bigram inside one doc share every scored
    # value, so the occurrence multiplicity is carried as a weight (cnt)
    # from here on — occurrence-exact by construction
    dbc = (
        bg.groupBy("id", "bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)  # feeds c2, c1 and the rollup
    )
    w1 = F.substring_index(F.col("bg"), " ", 1)
    c2 = dbc.groupBy("bg").agg(F.sum("cnt").alias("c2"))
    # prefix counts roll up from the bigram counts (c(w1 .) = sum of
    # c(w1 w2) over w2) — a vocabulary-sized rollup of c2
    c1 = c2.groupBy(w1.alias("w1")).agg(F.sum("c2").alias("c1"))
    scored = (
        dbc.join(c2, "bg")
        .join(c1, w1 == F.col("w1"))
        .select(
            "id",
            "cnt",
            F.expr("CAST(c2 * 1000000 AS DECIMAL(38,0)) div c1")
            .cast("long")
            .alias("p_micro"),
            F.col("c2").alias("bc"),
        )
    )
    return scored.groupBy("id").agg(
        F.expr("SUM(cnt)").cast("long").alias("n_bigrams"),
        F.expr("CAST(SUM(p_micro * cnt) AS DECIMAL(38,0)) div SUM(cnt)")
        .cast("long")
        .alias("mean_bigram_p_micro"),
        F.expr(
            "CAST(SUM(CASE WHEN bc <= 2 THEN cnt ELSE 0 END) * 1000000 "
            "AS DECIMAL(38,0)) div SUM(cnt)"
        )
        .cast("long")
        .alias("rare_bigram_frac_micro"),
    )


# ---------------------------------------------------------------------------
# readability — Flesch reading ease in exact milli units with a
# deterministic vowel-group syllable heuristic.

READABILITY_SQL = """
WITH d AS (
    SELECT doc_id, text,
           greatest(1, len(list_filter(
               string_split_regex(text, '[.!?]+'), s -> trim(s) <> ''))) AS s,
           list_filter(string_split_regex(trim(text), '\\s+'),
                       t -> t <> '') AS words
    FROM documents WHERE text IS NOT NULL
),
syl AS (
    SELECT doc_id, s, greatest(1, len(words)) AS w,
           list_sum(list_transform(words, wd ->
               greatest(1, len(regexp_replace(lower(wd), '[aeiouy]+', '#', 'g'))
                           - len(replace(regexp_replace(lower(wd), '[aeiouy]+', '#', 'g'),
                                         '#', ''))))) AS sy
    FROM d
)
SELECT doc_id AS id,
       CAST(s AS BIGINT) AS n_sentences,
       CAST(w AS BIGINT) AS n_words,
       CAST(COALESCE(sy, 0) AS BIGINT) AS n_syllables,
       CAST(206835 - (1015 * w) // s
                   - (84600 * COALESCE(sy, 0)) // w AS BIGINT)
           AS flesch_milli
FROM syl
"""


@register("readability_scores", oracle=READABILITY_SQL, covers=["A2", "P2"])
def q_readability_scores(spark, sf_dir):
    """Flesch reading ease per document, exact: 206.835 - 1.015*(W/S) -
    84.6*(Syl/W) carried in milli units with truncating integer
    division. Syllables = vowel-group count per word (min 1) — the
    standard deterministic heuristic; sentences = [.!?]+ splits with
    non-blank content (min 1 — guards division). A narrow per-row pass
    (no join, no shuffle beyond the source scan) — the readability
    band is a classic corpus-quality gate."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    sentences = F.greatest(
        F.lit(1),
        F.size(
            F.filter(
                F.split(F.col("text"), r"[.!?]+"), lambda s: F.trim(s) != ""
            )
        ),
    )
    words = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    vg = lambda wd: F.regexp_replace(F.lower(wd), "[aeiouy]+", "#")  # noqa: E731
    syl_of = lambda wd: F.greatest(  # noqa: E731
        F.lit(1),
        F.length(vg(wd)) - F.length(F.regexp_replace(vg(wd), "#", "")),
    )
    return docs.select(
        F.col("doc_id").alias("id"),
        sentences.cast("long").alias("n_sentences"),
        F.greatest(F.lit(1), F.size(words)).cast("long").alias("n_words"),
        F.coalesce(
            F.aggregate(
                words, F.lit(0).cast("long"), lambda acc, wd: acc + syl_of(wd)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_syllables"),
    ).withColumn(
        "flesch_milli",
        F.expr(
            "CAST(206835 - (1015 * n_words) div n_sentences "
            "- (84600 * n_syllables) div n_words AS BIGINT)"
        ),
    )


# ---------------------------------------------------------------------------
# Rocchio-style pseudo-relevance feedback: expansion terms mined from the
# BM25 top-10 of a fixed query.

_PRF_TERMS = ("spark", "query", "join")
_PRF_TERMS_SQL = ", ".join(f"'{t}'" for t in _PRF_TERMS)

PRF_SQL = f"""
WITH toks AS (
    SELECT doc_id AS id, t.term
    FROM documents, unnest(string_split_regex(trim(text), '\\s+')) t(term)
    WHERE t.term <> ''
),
tf AS (SELECT id, term, COUNT(*) AS tf FROM toks GROUP BY id, term),
qtf AS (SELECT id, term, tf FROM tf WHERE term IN ({_PRF_TERMS_SQL})),
dfq AS (SELECT term, COUNT(*) AS df FROM qtf GROUP BY term),
dl AS (
    SELECT doc_id AS id,
           len(string_split_regex(trim(text), '\\s+')) AS dl
    FROM documents
),
stats AS (
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
               AS sum_dl
    FROM documents
),
contrib AS (
    SELECT q.id,
           CAST(round(round(
               round(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)), 6)
               * ((q.tf * (1.2 + 1)) /
                  (q.tf + 1.2 * ((1 - 0.75) + 0.75 * (l.dl / (s.sum_dl / s.n_docs)))))
               , 6) * 1000000, 0) AS BIGINT) AS c6
    FROM qtf q
    JOIN dfq d USING (term)
    JOIN dl l ON l.id = q.id
    CROSS JOIN stats s
),
scores AS (SELECT id, CAST(SUM(c6) AS BIGINT) AS s6 FROM contrib GROUP BY id),
top AS (SELECT id FROM scores ORDER BY s6 DESC, id LIMIT 10),
expn AS (
    SELECT tf.term,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tf.tf) AS BIGINT) AS total_tf
    FROM tf JOIN top USING (id)
    WHERE tf.term NOT IN ({_PRF_TERMS_SQL})
    GROUP BY tf.term
)
SELECT term, n_docs, total_tf FROM expn
ORDER BY total_tf DESC, term LIMIT 8
"""


@register("prf_query_expansion", oracle=PRF_SQL, covers=["A2", "J1", "O6"])
def q_prf_query_expansion(spark, sf_dir):
    """Pseudo-relevance feedback (Rocchio's positive term): run the
    fixed query through BM25, take the top-10 documents (exact integer
    score sum, id tie-break), and surface the 8 most frequent non-query
    terms in that pseudo-relevant set — the classic query-expansion
    mining step of a retrieval pipeline.

    Scale shape: BM25's corpus stats are broadcast one-row frames, the
    top-10 is TakeOrderedAndProject (never a global window), the
    pseudo-relevant doc set is 10 ids broadcast into the tf table, and
    the expansion rollup aggregates only those docs' terms."""
    from prosnet_prefect_pipelines_spark.operators import ranking as R

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scores = R.bm25(docs, "doc_id", "text", list(_PRF_TERMS))
    top = (
        scores.orderBy(F.col("score").desc(), F.col("id"))
        .limit(10)
        .select("id")
    )
    tf = (
        docs.select(
            F.col("doc_id").alias("id"),
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    expn = (
        tf.join(F.broadcast(top), "id")
        .filter(~F.col("term").isin(*_PRF_TERMS))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("tf").cast("long").alias("total_tf"),
        )
    )
    return expn.orderBy(F.col("total_tf").desc(), F.col("term")).limit(8)


# ---------------------------------------------------------------------------
# class-balanced sampling plan: undersample every class to the minority
# count, membership by portable hash order.

_FRAC48 = (
    "list_sum(list_transform(generate_series(1, 12), i -> "
    "CAST(strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR) || 'bal'), i, 1)) - 1 AS BIGINT)"
    " * CAST(power(16, 12 - i) AS BIGINT)))"
)

BALANCE_SQL = f"""
WITH counts AS (SELECT label, COUNT(*) AS c FROM embeddings GROUP BY label),
tgt AS (SELECT MIN(c) AS target FROM counts),
ranked AS (
    SELECT vec_id, label,
           row_number() OVER (PARTITION BY label
                              ORDER BY {_FRAC48}, vec_id) AS rn
    FROM embeddings
)
SELECT r.vec_id, r.label,
       CAST(CASE WHEN r.rn <= t.target THEN 1 ELSE 0 END AS INT) AS kept
FROM ranked r CROSS JOIN tgt t
"""


@register("class_balance_plan", oracle=BALANCE_SQL, covers=["A2", "O6"])
def q_class_balance_plan(spark, sf_dir):
    """Class-balanced undersampling plan: every class keeps exactly
    min-class-count rows, chosen by portable md5-hash order (salt 'bal')
    with id tie-break — deterministic, engine-portable, and label-
    stratified without any RNG state. Emits the keep/drop decision for
    EVERY row (the auditable plan a training pipeline applies).

    Scale: the per-class window sorts only within a class (classes are
    the partition key — bounded, parallel); the target is a broadcast
    single row. For classes too large to sort, the same hash admits a
    threshold-style approximate variant (keep if frac < target/c) at
    the cost of exact counts — documented trade."""
    from prosnet_prefect_pipelines_spark.operators.sampling import (
        portable_fraction,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("c"))
    tgt = counts.agg(F.min("c").alias("target"))
    w = Window.partitionBy("label").orderBy(
        portable_fraction(F.col("vec_id"), "bal"), F.col("vec_id")
    )
    ranked = emb.select("vec_id", "label").withColumn(
        "rn", F.row_number().over(w)
    )
    return ranked.join(F.broadcast(tgt)).select(
        "vec_id",
        "label",
        F.when(F.col("rn") <= F.col("target"), 1)
        .otherwise(0)
        .cast("int")
        .alias("kept"),
    )


# ---------------------------------------------------------------------------
# association rules with lift over order baskets.

ASSOC_SQL = """
WITH baskets AS (
    SELECT DISTINCT l_orderkey AS bid, l_partkey % 40 AS item FROM lineitem
),
nb AS (SELECT COUNT(DISTINCT bid) AS n FROM baskets),
ic AS (SELECT item, COUNT(*) AS c FROM baskets GROUP BY item),
pc AS (
    SELECT x.item AS a, y.item AS b, COUNT(*) AS cab
    FROM baskets x JOIN baskets y ON x.bid = y.bid AND x.item < y.item
    GROUP BY x.item, y.item
)
SELECT CAST(p.a AS BIGINT) AS a, CAST(p.b AS BIGINT) AS b,
       CAST(p.cab AS BIGINT) AS n_ab,
       CAST(CAST(p.cab AS HUGEINT) * 1000000 // nb.n AS BIGINT)
           AS support_ppm,
       CAST(CAST(p.cab AS HUGEINT) * 1000000 // ia.c AS BIGINT)
           AS conf_ab_ppm,
       CAST(CAST(p.cab AS HUGEINT) * 1000000 // ib.c AS BIGINT)
           AS conf_ba_ppm,
       CAST(CAST(p.cab AS HUGEINT) * nb.n * 1000000 // (ia.c * ib.c)
            AS BIGINT) AS lift_ppm
FROM pc p
JOIN ic ia ON ia.item = p.a
JOIN ic ib ON ib.item = p.b
CROSS JOIN nb
WHERE p.cab >= 5
"""


@register("assoc_rules_lift", oracle=ASSOC_SQL, covers=["A1", "J1", "A2"])
def q_assoc_rules_lift(spark, sf_dir):
    """Market-basket association rules: pairwise co-occurrence over
    order baskets with support / both-direction confidence / lift, all
    truncating-integer ppm. Candidate pairs exist only where items
    truly co-occur (basket-keyed self-join, quadratic per basket size,
    never |items|²); item counts and the basket total are broadcast
    dimension/single-row frames. min-support 5 prunes the noise tail."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    baskets = li.select(
        F.col("l_orderkey").alias("bid"),
        (F.col("l_partkey") % 40).alias("item"),
    ).distinct()
    nb = baskets.agg(F.countDistinct("bid").alias("n"))
    ic = baskets.groupBy("item").agg(F.count(F.lit(1)).alias("c"))
    pc = (
        baskets.alias("x")
        .join(baskets.alias("y"), "bid")
        .filter(F.col("x.item") < F.col("y.item"))
        .groupBy(F.col("x.item").alias("a"), F.col("y.item").alias("b"))
        .agg(F.count(F.lit(1)).alias("cab"))
        .filter(F.col("cab") >= 5)
    )
    ia = ic.select(F.col("item").alias("a"), F.col("c").alias("ca"))
    ib = ic.select(F.col("item").alias("b"), F.col("c").alias("cb"))
    return (
        pc.join(F.broadcast(ia), "a")
        .join(F.broadcast(ib), "b")
        .join(F.broadcast(nb))
        .select(
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            F.col("cab").cast("long").alias("n_ab"),
            F.expr("CAST(cab * 1000000 AS DECIMAL(38,0)) div n")
            .cast("long")
            .alias("support_ppm"),
            F.expr("CAST(cab * 1000000 AS DECIMAL(38,0)) div ca")
            .cast("long")
            .alias("conf_ab_ppm"),
            F.expr("CAST(cab * 1000000 AS DECIMAL(38,0)) div cb")
            .cast("long")
            .alias("conf_ba_ppm"),
            F.expr(
                "CAST(cab * n AS DECIMAL(38,0)) * 1000000 div (ca * cb)"
            )
            .cast("long")
            .alias("lift_ppm"),
        )
    )
