"""Pipeline batch 73 (north-star extension): search-engine machinery —
positional phrase search, trigram-indexed substring search, SymSpell
spelling suggestions, KWIC snippets, and boolean retrieval.

The inverted-index tier under the BM25/RRF scoring queries: postings
are (term, doc, pos) rows built by one tokenize pass; every query here
is candidate-generation-then-verify, the shape that scales (the index
join prunes, the verification touches only candidates)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans.catalog import register

# shared: positional postings CTE (DuckDB) — struct-unnest carries pos
POSTINGS_CTE = """
d AS (
    SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'),
                               t -> t <> '') AS arr
    FROM documents WHERE text IS NOT NULL
),
postings AS (
    SELECT doc_id, u.p AS pos, u.w AS term
    FROM d, unnest(list_transform(generate_series(1, len(arr)),
                                  i -> {'p': i, 'w': arr[i]})) t(u)
)
"""


def _postings(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    return docs.select(
        "doc_id", F.posexplode(toks).alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")


# ---------------------------------------------------------------------------
# positional phrase search.

PHRASE_SQL = f"""
WITH {POSTINGS_CTE}
SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(MIN(a.pos) AS BIGINT) AS first_pos
FROM postings a JOIN postings b
  ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
WHERE a.term = 'hash' AND b.term = 'join'
GROUP BY a.doc_id
"""


@register("phrase_search_positional", oracle=PHRASE_SQL, covers=["J1", "A2"])
def q_phrase_search_positional(spark, sf_dir):
    """Positional phrase search: documents containing the exact phrase
    "hash join" found by joining the two terms' postings on
    (doc, pos+1) — the adjacency join a positional inverted index
    answers phrase queries with. Each side is a selective term filter
    (index seek at scale), the join keys on (doc, pos); no document
    text is re-scanned."""
    p = _postings(spark, sf_dir)
    a = p.filter(F.col("term") == "hash").select("doc_id", "pos")
    b = p.filter(F.col("term") == "join").select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    return (
        a.join(b, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("pos").cast("long").alias("first_pos"),
        )
    )


# ---------------------------------------------------------------------------
# trigram-indexed substring search.

TRGM_SQL = """
WITH toks AS (
    SELECT DISTINCT doc_id, t.term
    FROM documents, unnest(string_split_regex(trim(text), '\\s+')) t(term)
    WHERE text IS NOT NULL AND len(t.term) >= 3
),
trgm AS (
    SELECT DISTINCT doc_id, term,
           substr(term, g.i, 3) AS tg
    FROM toks, generate_series(1, 30) g(i)
    WHERE g.i + 2 <= len(term)
),
cand AS (
    SELECT doc_id, term FROM trgm WHERE tg IN ('ndo', 'dow')
    GROUP BY doc_id, term HAVING COUNT(DISTINCT tg) = 2
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_matching_terms,
       MIN(term) AS first_term
FROM cand WHERE contains(term, 'ndow')
GROUP BY doc_id
"""


@register("substring_trgm_search", oracle=TRGM_SQL, covers=["J1", "A1"])
def q_substring_trgm_search(spark, sf_dir):
    """Trigram-indexed substring search (the pg_trgm pattern): terms
    containing "ndow" are found by requiring ALL the needle's trigrams
    in the term's trigram set (index intersection — candidate
    generation), then verifying contains() ONLY on candidates. At scale
    the trigram postings prune the corpus to a sliver before any
    substring scan; the LIKE never touches non-candidates."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
        )
        .filter(F.length("term") >= 3)
        .distinct()
    )
    trgm = (
        toks.select(
            "doc_id",
            "term",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("term") - 2),
                    lambda i: F.col("term").substr(i, F.lit(3)),
                )
            ).alias("tg"),
        )
        .distinct()
    )
    cand = (
        trgm.filter(F.col("tg").isin("ndo", "dow"))
        .groupBy("doc_id", "term")
        .agg(F.countDistinct("tg").alias("k"))
        .filter(F.col("k") == 2)
    )
    return (
        cand.filter(F.col("term").contains("ndow"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matching_terms"),
            F.min("term").alias("first_term"),
        )
    )


# ---------------------------------------------------------------------------
# SymSpell spelling suggestion.

_QUERY_TERM = "winow"  # misspelling of 'window' (one deletion)

SYMSPELL_SQL = f"""
WITH vocab AS (
    SELECT t.term, COUNT(*) AS freq
    FROM documents, unnest(string_split_regex(trim(text), '\\s+')) t(term)
    WHERE text IS NOT NULL AND t.term <> ''
    GROUP BY t.term
),
vdel AS (
    -- each vocab term plus all single-deletion variants
    SELECT term, freq, term AS variant FROM vocab
    UNION
    SELECT term, freq,
           substr(term, 1, g.i - 1) || substr(term, g.i + 1) AS variant
    FROM vocab, generate_series(1, 40) g(i) WHERE g.i <= len(term)
),
qdel AS (
    SELECT '{_QUERY_TERM}' AS variant
    UNION
    SELECT substr('{_QUERY_TERM}', 1, g.i - 1) || substr('{_QUERY_TERM}', g.i + 1)
    FROM generate_series(1, {len(_QUERY_TERM)}) g(i)
),
cand AS (
    SELECT DISTINCT v.term, v.freq FROM vdel v JOIN qdel q USING (variant)
)
SELECT term, CAST(freq AS BIGINT) AS freq,
       CAST(levenshtein(term, '{_QUERY_TERM}') AS BIGINT) AS dist
FROM cand
WHERE levenshtein(term, '{_QUERY_TERM}') <= 2
ORDER BY dist, freq DESC, term LIMIT 5
"""


@register("symspell_suggest", oracle=SYMSPELL_SQL, covers=["J1", "O1"])
def q_symspell_suggest(spark, sf_dir):
    """SymSpell spelling suggestion: vocabulary terms AND the query each
    expand to their single-deletion variants; a candidate is any term
    sharing a variant with the query (covers edit distance <= 2 for
    delete+delete matches), then true Levenshtein verifies and ranks
    (distance, corpus frequency desc). The deletion trick turns fuzzy
    match into an EQUI join on variants — no all-pairs edit distance,
    the reason SymSpell scales where brute-force fuzzy search cannot."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    vocab = (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    dels = F.transform(
        F.sequence(F.lit(1), F.length("term")),
        lambda i: F.concat(
            F.col("term").substr(F.lit(1), i - 1),
            F.col("term").substr(i + 1, F.length("term")),
        ),
    )
    vdel = vocab.select(
        "term", "freq", F.explode(F.array_union(F.array(F.col("term")), dels)).alias("variant")
    ).distinct()
    q = _QUERY_TERM
    qvars = list({q} | {q[:i] + q[i + 1 :] for i in range(len(q))})
    cand = (
        vdel.filter(F.col("variant").isin(qvars))
        .select("term", "freq")
        .distinct()
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit(q)))
        .filter(F.col("dist") <= 2)
    )
    return (
        cand.orderBy("dist", F.col("freq").desc(), "term")
        .limit(5)
        .select(
            "term",
            F.col("freq").cast("long").alias("freq"),
            F.col("dist").cast("long").alias("dist"),
        )
    )


# ---------------------------------------------------------------------------
# KWIC (keyword in context) snippets.

KWIC_SQL = f"""
WITH {POSTINGS_CTE},
hits AS (
    SELECT p.doc_id, p.pos, d.arr
    FROM postings p JOIN d ON d.doc_id = p.doc_id
    WHERE p.term = 'spark'
)
SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       array_to_string(arr[greatest(1, pos - 2):least(len(arr), pos + 2)], ' ')
           AS snippet
FROM hits
"""


@register("kwic_snippets", oracle=KWIC_SQL, covers=["J1", "P2"])
def q_kwic_snippets(spark, sf_dir):
    """KWIC (keyword-in-context) snippets: every occurrence of 'spark'
    with the +/-2-token window around it — the search-result
    highlighting extraction. The hit list is a postings filter joined
    back to the token arrays on the doc key; the slice is a pure array
    expression."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    d = docs.select("doc_id", toks.alias("arr"))
    hits = _postings(spark, sf_dir).filter(F.col("term") == "spark").join(
        d, "doc_id"
    )
    start = F.greatest(F.lit(1), F.col("pos") - 2)
    length = (
        F.least(F.size("arr"), F.col("pos") + 2) - start + 1
    )
    return hits.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.array_join(F.slice(F.col("arr"), start, length), " ").alias("snippet"),
    )


# ---------------------------------------------------------------------------
# boolean retrieval.

BOOLEAN_SQL = """
WITH toks AS (
    SELECT DISTINCT doc_id, t.term
    FROM documents, unnest(string_split_regex(trim(text), '\\s+')) t(term)
    WHERE text IS NOT NULL
),
a AS (SELECT doc_id FROM toks WHERE term = 'scan'),
b AS (SELECT doc_id FROM toks WHERE term = 'join'),
c AS (SELECT doc_id FROM toks WHERE term = 'merge')
SELECT doc_id, CAST(1 AS INT) AS matched
FROM ((SELECT doc_id FROM a INTERSECT SELECT doc_id FROM b)
      EXCEPT SELECT doc_id FROM c) t
"""


@register("boolean_retrieval", oracle=BOOLEAN_SQL, covers=["J7", "O3"])
def q_boolean_retrieval(spark, sf_dir):
    """Boolean retrieval: documents matching (scan AND join) NOT merge
    as set operations over the distinct postings lists — the classic
    pre-ranking boolean filter of an inverted index. AND = posting-list
    intersection (semi join), NOT = anti join; each list is a selective
    term filter."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
        )
        .distinct()
    )
    a = toks.filter(F.col("term") == "scan").select("doc_id")
    b = toks.filter(F.col("term") == "join").select("doc_id")
    c = toks.filter(F.col("term") == "merge").select("doc_id")
    return (
        a.join(b, "doc_id", "left_semi")
        .join(c, "doc_id", "left_anti")
        .select("doc_id", F.lit(1).cast("int").alias("matched"))
    )
