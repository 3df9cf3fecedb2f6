"""Pipeline batch 44: storage-encoding and LSH-tuning advisors —

- ``encoding_advisor``: per-column encoding recommendation for the
  fact table (dictionary / RLE / plain) from measured statistics:
  distinct ratio and within-rowgroup run structure. Runs are counted
  inside each order group (the unit an encoder actually sees — pages
  are written per row group, so cross-group boundaries don't matter),
  which keeps the lag window keyed and scale-safe.
- ``lsh_scurve_table``: the canonical MinHash-LSH tuning table — the
  probability 1 - (1 - j^r)^b that a pair with Jaccard j becomes a
  candidate, for the engine's (r=3 rows/band, b=4 bands) configuration
  and neighbours, on a j = 0.1..0.9 grid. Computed in EXACT integer
  arithmetic: j = jn/10, so p_ppm = (10^(r*b) - (10^r - jn^r)^b) * 1e6
  div 10^(r*b) — no pow(), no floats; both engines multiply the same
  integers. Read next to ``minhash_recall_report``: the measured
  recall should sit where the curve predicts.

Scale notes: the advisor is two keyed aggregations over the fact
table; the S-curve table is O(grid x configs) rows of pure arithmetic
computed from a generated frame — zero scans.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register

_COLS = ["l_returnflag", "l_linestatus", "l_quantity", "l_shipdate"]

_COL_SQL = ", ".join(f"CAST({c} AS VARCHAR) AS {c}" for c in _COLS)

ENCODING_SQL = f"""
WITH src AS (
    SELECT l_orderkey, l_linenumber, {_COL_SQL} FROM lineitem
),
long AS (
    SELECT l_orderkey, l_linenumber, col, val FROM src
    UNPIVOT (val FOR col IN ({', '.join(_COLS)}))
),
runs AS (
    SELECT col, val,
           -- (orderkey, linenumber) is NOT unique in the synthetic data:
           -- order ties by val so run boundaries are deterministic
           CASE WHEN lag(val) OVER (PARTITION BY l_orderkey, col
                                    ORDER BY l_linenumber, val) IS DISTINCT FROM val
                THEN 1 ELSE 0 END AS is_run_start
    FROM long
),
stats AS (
    SELECT col,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
           CAST(SUM(is_run_start) AS BIGINT) AS n_runs
    FROM runs GROUP BY col
)
SELECT col, n_values, n_distinct, n_runs,
       CAST(CAST(n_distinct AS HUGEINT) * 1000000 // n_values AS BIGINT)
           AS distinct_ppm,
       CAST(CAST(n_values AS HUGEINT) * 1000 // n_runs AS BIGINT)
           AS avg_run_milli,
       CASE WHEN n_values >= 4 * n_runs THEN 'rle'
            WHEN 100 * n_distinct <= n_values THEN 'dict'
            ELSE 'plain' END AS encoding
FROM stats
"""


@register("encoding_advisor", oracle=ENCODING_SQL, covers=["A1", "A2", "O1"])
def q_encoding_advisor(spark, sf_dir):
    """Column encoding advisor: distinct ratio (ppm) + run structure
    (runs counted within each (orderkey, col) group via one keyed lag
    window — the row-group-local view an encoder has) -> rle when the
    average run reaches 4, dict when <=1% distinct, else plain. Two
    keyed passes, exact integer ratios."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    long = li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack("
            + str(len(_COLS))
            + ", "
            + ", ".join(f"'{c}', CAST({c} AS STRING)" for c in _COLS)
            + ") AS (col, val)"
        ),
    )
    w = Window.partitionBy("l_orderkey", "col").orderBy("l_linenumber", "val")
    runs = long.select(
        "col",
        "val",
        F.when(
            ~F.lag("val").over(w).eqNullSafe(F.col("val")), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("is_run_start"),
    )
    stats = runs.groupBy("col").agg(
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.countDistinct("val").cast("long").alias("n_distinct"),
        F.sum("is_run_start").cast("long").alias("n_runs"),
    )
    return stats.select(
        "col",
        "n_values",
        "n_distinct",
        "n_runs",
        F.expr(
            "CAST(CAST(n_distinct AS DECIMAL(38,0)) * 1000000 div n_values AS BIGINT)"
        ).alias("distinct_ppm"),
        F.expr(
            "CAST(CAST(n_values AS DECIMAL(38,0)) * 1000 div n_runs AS BIGINT)"
        ).alias("avg_run_milli"),
        F.when(F.col("n_values") >= 4 * F.col("n_runs"), F.lit("rle"))
        .when(100 * F.col("n_distinct") <= F.col("n_values"), F.lit("dict"))
        .otherwise(F.lit("plain"))
        .alias("encoding"),
    )


# (rows-per-band, bands) configurations around the engine's 3x4 default
_CONFIGS = [(2, 6), (3, 4), (4, 3), (6, 2)]


def _unrolled(base: str, exp: int) -> str:
    """Exact integer power by explicit multiplication (no pow())."""
    return "(" + " * ".join([base] * exp) + ")"


def _cfg_rows_sql() -> str:
    parts = []
    for r, b in _CONFIGS:
        p10r = 10 ** r
        jnr = _unrolled("CAST(jn AS HUGEINT)", r)
        inner = f"(CAST({p10r} AS HUGEINT) - {jnr})"
        innerb = _unrolled(inner, b)
        p10rb = 10 ** (r * b)
        parts.append(
            f"SELECT {r} AS r, {b} AS b, CAST(jn * 100000 AS BIGINT) AS jaccard_micro, "
            f"CAST((CAST({p10rb} AS HUGEINT) - {innerb}) * 1000000 "
            f"// CAST({p10rb} AS HUGEINT) AS BIGINT) AS p_candidate_ppm "
            "FROM grid"
        )
    return " UNION ALL ".join(parts)


SCURVE_SQL = f"""
WITH grid AS (SELECT UNNEST(generate_series(1, 9)) AS jn)
{_cfg_rows_sql()}
"""


@register("lsh_scurve_table", oracle=SCURVE_SQL, covers=["A2", "J4"])
def q_lsh_scurve_table(spark, sf_dir):
    """MinHash-LSH S-curves in exact integers: candidate probability
    1-(1-j^r)^b for four (rows, bands) configurations on a j grid.
    Every power is an UNROLLED integer product (generated per literal
    config — no pow(), whose libm result is not ulp-exact even for
    integer operands), one final floor-division into ppm. The table
    that justifies the engine's 3x4 default against its neighbours,
    cross-checked by the measured minhash_recall_report."""
    from pyspark.sql import DataFrame

    grid = spark.range(1, 10).select(F.col("id").cast("int").alias("jn"))
    outs: list[DataFrame] = []
    for r, b in _CONFIGS:
        p10r = 10 ** r
        jnr = _unrolled("CAST(jn AS DECIMAL(38,0))", r)
        inner = f"(CAST({p10r} AS DECIMAL(38,0)) - {jnr})"
        innerb = _unrolled(inner, b)
        p10rb = 10 ** (r * b)
        outs.append(
            grid.select(
                F.lit(r).cast("int").alias("r"),
                F.lit(b).cast("int").alias("b"),
                (F.col("jn").cast("long") * 100000).alias("jaccard_micro"),
                F.expr(
                    f"CAST((CAST({p10rb} AS DECIMAL(38,0)) - {innerb}) * 1000000 "
                    f"div CAST({p10rb} AS DECIMAL(38,0)) AS BIGINT)"
                ).alias("p_candidate_ppm"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out
