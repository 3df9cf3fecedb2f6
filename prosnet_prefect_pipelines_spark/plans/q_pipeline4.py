"""Training-data pipeline queries, batch 4 (north-star extension):
document chunking, quantile-rank normalization, mergeable HLL sketches,
and product-quantization codes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators import sketch as SK
from prosnet_prefect_pipelines_spark.operators import similarity as S
from prosnet_prefect_pipelines_spark.operators import textstats as T
from prosnet_prefect_pipelines_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# document chunking (context-window prep)

_CHUNK, _STRIDE = 64, 48

CHUNKING_SQL = f"""
WITH t AS (
    SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS l
    FROM documents
    WHERE len(string_split_regex(trim(text), '\\s+')) > 0
)
SELECT id,
       CAST(start // {_STRIDE} AS BIGINT) AS chunk_id,
       CAST(len(l[start + 1 : start + {_CHUNK}]) AS BIGINT) AS n_tokens,
       array_to_string(l[start + 1 : start + {_CHUNK}], ' ') AS chunk_text
FROM t, unnest(generate_series(0, len(l) - 1, {_STRIDE})) AS u(start)
"""


@register("doc_chunking", oracle=CHUNKING_SQL, covers=["P2", "O2"])
def q_doc_chunking(spark, sf_dir):
    """X-CHUNK: overlapping token windows (size 64, stride 48) — the
    RAG/LM context-window preparation pass. Tokenize + one posexplode,
    no shuffle, no UDF."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return T.chunk_tokens(docs, "doc_id", "text", size=_CHUNK, stride=_STRIDE)


# ---------------------------------------------------------------------------
# quantile-rank normalization

QNORM_SQL = """
SELECT event_id, event_type,
       CAST((rank() OVER (PARTITION BY event_type ORDER BY value) - 1)
            * 1000000
            // GREATEST(COUNT(*) OVER (PARTITION BY event_type) - 1, 1)
            AS BIGINT) AS pct_micro
FROM events
"""


@register("quantile_transform", oracle=QNORM_SQL, covers=["O1", "A2"])
def q_quantile_transform(spark, sf_dir):
    """X-QNORM: per-group percentile-rank transform (micro units) — the
    feature-normalization pass that makes heavy-tailed columns
    comparable. One keyed window (event_type), never a global sort;
    ties share a rank() value identically in both engines."""
    from pyspark.sql.window import Window

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("event_type").orderBy("value")
    wn = Window.partitionBy("event_type")
    return events.select(
        "event_id",
        "event_type",
        F.rank().over(w).alias("_rk"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    ).select(
        "event_id",
        "event_type",
        F.expr(
            "(CAST(_rk - 1 AS BIGINT) * 1000000) div GREATEST(_n - 1, 1)"
        ).alias("pct_micro"),
    )


# ---------------------------------------------------------------------------
# mergeable HLL: batch sketches -> merged estimate == direct estimate

_HLL_ALPHA_M2 = repr(0.7213 / (1.0 + 1.079 / SK.HLL_M) * SK.HLL_M * SK.HLL_M)

# the oracle computes the direct sketch once; equality of the engine's
# merged-vs-direct columns IS the distributivity property under test
HLL_MERGE_SQL = f"""
WITH h AS (
    SELECT event_type,
           list_sum(list_transform(generate_series(1, 12), i ->
               CAST(strpos('0123456789abcdef',
                           substr(md5(CAST(user_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)
               * CAST(power(16, 12 - i) AS BIGINT))) AS hash48
    FROM events
),
parts AS (
    SELECT event_type,
           hash48 // {1 << SK._REM_BITS} AS b,
           hash48 % {1 << SK._REM_BITS} AS rem
    FROM h
),
regs AS (
    SELECT event_type, b,
           MAX({SK._REM_BITS + 1} - length(ltrim(bin(rem), '0'))) AS rank
    FROM parts GROUP BY event_type, b
),
agg AS (
    SELECT event_type, COUNT(*) AS nset,
           SUM(1.0 / (CAST(1 AS BIGINT) << rank)) AS s
    FROM regs GROUP BY event_type
)
SELECT event_type,
       CAST(FLOOR({_HLL_ALPHA_M2} / (s + ({SK.HLL_M} - nset))) AS BIGINT)
           AS merged_estimate,
       CAST(FLOOR({_HLL_ALPHA_M2} / (s + ({SK.HLL_M} - nset))) AS BIGINT)
           AS direct_estimate
FROM agg
"""


@register("hll_merge", oracle=HLL_MERGE_SQL, covers=["A1"])
def q_hll_merge(spark, sf_dir):
    """X-HLL-MERGE: sketch two disjoint batches (event_id parity)
    separately, merge their register tables (union + MAX — 512 rows of
    work), and verify the merged estimate equals the direct
    whole-corpus estimate. This lattice property is what makes the
    sketch incremental: daily partials roll into yearly cardinality
    without revisiting history."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    b0 = SK.hll_registers(
        events.filter(F.col("event_id") % 2 == 0), ["event_type"], "user_id"
    )
    b1 = SK.hll_registers(
        events.filter(F.col("event_id") % 2 == 1), ["event_type"], "user_id"
    )
    merged = SK.hll_estimate(SK.hll_merge_registers(b0, b1), ["event_type"])
    direct = SK.hll_distinct(events, ["event_type"], "user_id")
    return merged.select(
        "event_type", F.col("hll_estimate").alias("merged_estimate")
    ).join(
        direct.select("event_type", F.col("hll_estimate").alias("direct_estimate")),
        on="event_type",
    )


# ---------------------------------------------------------------------------
# product-quantization codes

_PQ_SUB, _PQ_SUBDIM, _PQ_CELLS = 4, 16, 4

_PQ_DOT = (
    "list_reduce(list_transform(generate_series(1, {d}), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
)


def _pq_cos(a: str, b: str, d: int) -> str:
    dot = _PQ_DOT.format(a=a, b=b, d=d)
    na = _PQ_DOT.format(a=a, b=a, d=d)
    nb = _PQ_DOT.format(a=b, b=b, d=d)
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


def _pq_subspace_sql(s: int) -> str:
    """One subspace: slice -> seed centroids -> 1 Lloyd iteration ->
    assignment. Mirrors kmeans_centroids(n_cells=4, iterations=1) on the
    sliced vectors, like q_similarity's KMEANS_SQL does at full dim."""
    lo, hi = s * _PQ_SUBDIM + 1, (s + 1) * _PQ_SUBDIM
    d = _PQ_SUBDIM
    cos_xc = _pq_cos("x.v", "c.cv", d)
    return f"""
v{s} AS (SELECT vec_id AS id, embedding[{lo}:{hi}] AS v FROM embeddings),
c{s}0 AS (
    SELECT vec_id AS cid, embedding[{lo}:{hi}] AS cv
    FROM embeddings ORDER BY vec_id LIMIT {_PQ_CELLS}
),
a{s} AS (
    SELECT id, cid FROM (
        SELECT x.id, c.cid,
               row_number() OVER (
                   PARTITION BY x.id
                   ORDER BY round({cos_xc}, 6) DESC, c.cid
               ) AS rn
        FROM v{s} x CROSS JOIN c{s}0 c
    ) t WHERE rn = 1
),
m{s} AS (
    SELECT a.cid, p.pos,
           CAST(SUM(CAST(round(CAST(x.v[p.pos] AS DOUBLE) * 1000000000.0)
                         AS BIGINT)) AS DOUBLE)
           / COUNT(*) / 1000000000.0 AS m
    FROM a{s} a JOIN v{s} x ON a.id = x.id, generate_series(1, {d}) p(pos)
    GROUP BY a.cid, p.pos
),
r{s} AS (SELECT cid, list(m ORDER BY pos) AS cvr FROM m{s} GROUP BY cid),
c{s}1 AS (
    SELECT cid,
           list_transform(cvr, x -> CAST(x / sqrt(list_reduce(
               list_transform(cvr, y -> y * y), (xx, yy) -> xx + yy)) AS REAL))
               AS cv
    FROM r{s}
),
out{s} AS (
    SELECT id, {s} AS sub, cid AS code, scos FROM (
        SELECT x.id, c.cid, round({cos_xc}, 6) AS scos,
               row_number() OVER (
                   PARTITION BY x.id
                   ORDER BY round({cos_xc}, 6) DESC, c.cid
               ) AS rn
        FROM v{s} x CROSS JOIN c{s}1 c
    ) t WHERE rn = 1
)"""


PQ_SQL = (
    "WITH "
    + ",".join(_pq_subspace_sql(s) for s in range(_PQ_SUB))
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT id, CAST(sub AS INT) AS sub, code, scos FROM out{s}"
        for s in range(_PQ_SUB)
    )
)


@register("pq_codes", oracle=PQ_SQL, covers=["O6"])
def q_pq_codes(spark, sf_dir):
    """X-ANN-PQ: product-quantization codes — 4 subspaces x 16 dims,
    4-cell codebooks trained by the deterministic k-means trainer (1
    Lloyd iteration), nearest-centroid assignment per subvector. The
    embedding-compression tier past int8: n_sub bytes per vector +
    shared codebooks, reproducible bit-for-bit off-Spark."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.pq_encode(
        emb, "vec_id", "embedding", dim=64,
        n_sub=_PQ_SUB, n_cells=_PQ_CELLS, iterations=1,
    )
