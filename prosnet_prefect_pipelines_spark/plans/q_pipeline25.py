"""Pipeline batch 25 (north-star extension): TPC-H completion through
the PURE SQL API — every remaining TPC-H query expressible over the
testdata schema, running the SAME text on Spark and DuckDB.

Already shipped in batch 20: Q3, Q5, Q10. This batch adds Q1, Q6, Q7,
Q8, Q13, Q14, Q15, Q17, Q18, Q19, Q22. Not portable to this testdata
and deliberately skipped (documented, not stubbed): Q2/Q9/Q11/Q16/Q20
need the ``partsupp`` table; Q4/Q12/Q21 need ``l_commitdate``/
``l_receiptdate``/``l_shipmode``; the testdata generator emits none of
those columns (TESTDATA.md). Q13/Q17/Q19/Q22 are adapted where the
reference predicate touches a missing column (``o_comment``,
``p_container``, ``l_shipinstruct``, ``c_phone``) — the join/agg
algebra is unchanged, only the scalar filter moved to a column that
exists.

Cross-engine determinism strategy (same as batch 20, hardened):
monetary values go through EXACT integer arithmetic — prices/balances
to cents via ROUND(x*100), discount/tax to integer percent — summed as
BIGINT, and every emitted ratio/average is a SINGLE IEEE-754 division
of two exact integers, which is bit-identical on any IEEE engine. No
floating sums anywhere, so physical aggregation order can't change a
bit. Integer division uses DuckDB ``//`` in the oracle text and is
rewritten to Spark ``div`` via one string replace — the only dialect
delta.

Reference parity: the reference engine has no TPC-H surface; this file
is part of the north-star "complete SQL analytics engine" extension
(SURVEY §2 extension tier), exercising Catalyst join reordering,
broadcast selection, scalar subqueries, and HAVING pushdown at
1000-executor shapes (all joins are key-equi; dimension sides
broadcast; no cartesian anywhere).
"""

from __future__ import annotations

from prosnet_prefect_pipelines_spark.plans.catalog import register


def _views(spark, sf_dir, tables):
    for t in tables:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def _spark_text(sql: str) -> str:
    """DuckDB ``//`` -> Spark ``div`` and strftime -> date_format;
    everything else is shared text."""
    return sql.replace(" // ", " div ").replace(
        "strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d')",
        "date_format(o.o_orderdate, 'yyyy-MM-dd')",
    )


# exact integer units used throughout:
#   *_cents : dollars * 100                 (BIGINT, exact)
#   *_e4    : dollars * 100 * (100-disc)    (1e-4 dollars, exact)
#   *_e6    : ... * (100+tax)               (1e-6 dollars, exact)
_LI_CENTS = """
    SELECT l_orderkey, l_partkey, l_suppkey, l_shipdate,
           CAST(ROUND(l_quantity) AS BIGINT)              AS qty,
           CAST(ROUND(l_extendedprice * 100) AS BIGINT)   AS ep_cents,
           CAST(ROUND(l_discount * 100) AS BIGINT)        AS disc_pct,
           CAST(ROUND(l_tax * 100) AS BIGINT)             AS tax_pct,
           l_returnflag, l_linestatus
    FROM lineitem
"""


TPCH_Q1 = f"""
WITH li AS ({_LI_CENTS})
SELECT l_returnflag, l_linestatus,
       CAST(SUM(qty) AS BIGINT)                            AS sum_qty,
       CAST(SUM(ep_cents) AS DOUBLE) / 100.0               AS sum_base_price,
       CAST(SUM(ep_cents * (100 - disc_pct)) AS DOUBLE) / 10000.0   AS sum_disc_price,
       CAST(SUM(ep_cents * (100 - disc_pct) * (100 + tax_pct)) AS DOUBLE) / 1000000.0
                                                           AS sum_charge,
       CAST(SUM(qty) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
       CAST(SUM(ep_cents) AS DOUBLE) / CAST(COUNT(*) * 100 AS DOUBLE) AS avg_price,
       CAST(SUM(disc_pct) AS DOUBLE) / CAST(COUNT(*) * 100 AS DOUBLE) AS avg_disc,
       COUNT(*)                                            AS count_order
FROM li
WHERE l_shipdate <= TIMESTAMP '2001-06-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("sql_tpch_q1", oracle=TPCH_Q1, covers=["A2", "O1", "F16"])
def q_sql_tpch_q1(spark, sf_dir):
    """TPC-H Q1 (pricing summary) through the pure SQL API. One scan,
    map-side partial agg into 6 groups; all money math in exact BIGINT
    cents so Spark's and DuckDB's aggregation orders can't diverge —
    each output double is one IEEE division of two exact integers.
    Same text on both engines (`//`->`div` is the only rewrite)."""
    _views(spark, sf_dir, ["lineitem"])
    return spark.sql(_spark_text(TPCH_Q1))


TPCH_Q6 = f"""
WITH li AS ({_LI_CENTS})
SELECT CAST(SUM(ep_cents * disc_pct) AS DOUBLE) / 10000.0 AS revenue
FROM li
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND disc_pct BETWEEN 5 AND 7
  AND qty < 24
"""


@register("sql_tpch_q6", oracle=TPCH_Q6, covers=["A2", "F16"])
def q_sql_tpch_q6(spark, sf_dir):
    """TPC-H Q6 (forecasting revenue change): single-scan filtered
    global agg — the canonical pushdown test; the year window and the
    discount/quantity bands all reach the parquet scan. Discount is
    compared as integer percent, never as a float."""
    _views(spark, sf_dir, ["lineitem"])
    return spark.sql(_spark_text(TPCH_Q6))


TPCH_Q7 = f"""
WITH li AS ({_LI_CENTS})
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(vol_e4) AS DOUBLE) / 10000.0 AS revenue
FROM (
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
           l.ep_cents * (100 - l.disc_pct) AS vol_e4
    FROM supplier s
    JOIN li l       ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("sql_tpch_q7", oracle=TPCH_Q7, covers=["J1", "A2", "F16"])
def q_sql_tpch_q7(spark, sf_dir):
    """TPC-H Q7 (volume shipping): 6-way join with a symmetric
    nation-pair disjunction. Both nation sides broadcast; the fact
    scan keeps only the 2-year ship window. Year extraction stays
    integer end-to-end."""
    _views(spark, sf_dir, ["lineitem", "supplier", "orders", "customer", "nation"])
    return spark.sql(_spark_text(TPCH_Q7))


TPCH_Q8 = f"""
WITH li AS ({_LI_CENTS})
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_3' THEN vol_e4 ELSE 0 END) AS DOUBLE)
         / CAST(SUM(vol_e4) AS DOUBLE) AS mkt_share
FROM (
    SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
           l.ep_cents * (100 - l.disc_pct) AS vol_e4,
           n2.n_name AS nation
    FROM part p
    JOIN li l       ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN region r   ON n1.n_regionkey = r.r_regionkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'EUROPE'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND p.p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@register("sql_tpch_q8", oracle=TPCH_Q8, covers=["J1", "A2", "F16"])
def q_sql_tpch_q8(spark, sf_dir):
    """TPC-H Q8 (national market share): 8-way join, conditional-sum
    share. The share is numerator/denominator of two exact BIGINT sums
    — one IEEE division, so join order and partial-agg order are free
    for Catalyst to choose without perturbing output bits."""
    _views(spark, sf_dir,
           ["lineitem", "part", "supplier", "orders", "customer", "nation", "region"])
    return spark.sql(_spark_text(TPCH_Q8))


# Q13 adapted: the reference filters o_comment NOT LIKE '%special%requests%';
# testdata has no o_comment, so the excluded-order predicate moved to
# o_orderpriority — identical left-join + double-grouping algebra.
TPCH_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("sql_tpch_q13", oracle=TPCH_Q13, covers=["J2", "A2", "O1"])
def q_sql_tpch_q13(spark, sf_dir):
    """TPC-H Q13 (customer distribution): left join preserving
    order-less customers, then a histogram of per-customer order
    counts — two shuffles, all-integer output."""
    _views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(TPCH_Q13)


TPCH_Q14 = f"""
WITH li AS ({_LI_CENTS})
SELECT CAST(100 * SUM(CASE WHEN p.p_type = 'PROMO'
                           THEN l.ep_cents * (100 - l.disc_pct) ELSE 0 END) AS DOUBLE)
       / CAST(SUM(l.ep_cents * (100 - l.disc_pct)) AS DOUBLE) AS promo_revenue
FROM li l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
  AND l.l_shipdate < TIMESTAMP '1997-10-01'
"""


@register("sql_tpch_q14", oracle=TPCH_Q14, covers=["J1", "A2", "F16"])
def q_sql_tpch_q14(spark, sf_dir):
    """TPC-H Q14 (promotion effect): month-windowed fact scan joined
    to part (broadcast), conditional-share output as one IEEE division
    of exact integer sums."""
    _views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(_spark_text(TPCH_Q14))


TPCH_Q15 = f"""
WITH li AS ({_LI_CENTS}),
revenue AS (
    SELECT l_suppkey AS supplier_no,
           SUM(ep_cents * (100 - disc_pct)) AS total_e4
    FROM li
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(r.total_e4 AS DOUBLE) / 10000.0 AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_e4 = (SELECT MAX(total_e4) FROM revenue)
ORDER BY s.s_suppkey
"""


@register("sql_tpch_q15", oracle=TPCH_Q15, covers=["J1", "A2", "O1"])
def q_sql_tpch_q15(spark, sf_dir):
    """TPC-H Q15 (top supplier): the reference's CREATE VIEW becomes a
    CTE referenced twice — once for the per-supplier rollup, once for
    the scalar MAX subquery. Exact integer revenue makes the MAX
    tie-break deterministic across engines."""
    _views(spark, sf_dir, ["lineitem", "supplier"])
    return spark.sql(_spark_text(TPCH_Q15))


# Q17 adapted: reference filters p_brand + p_container; no container
# column exists, so the part slice is p_brand + p_size band. The
# signature avg-quantity correlation is kept EXACT: qty < 0.2 * avg(qty)
# is cross-multiplied to 5 * qty * cnt < sum_qty (no float avg anywhere).
TPCH_Q17 = f"""
WITH li AS ({_LI_CENTS}),
per_part AS (
    SELECT l_partkey, SUM(qty) AS sum_qty, COUNT(*) AS cnt
    FROM li GROUP BY l_partkey
)
SELECT CAST(SUM(l.ep_cents) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly
FROM li l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN per_part a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23' AND p.p_size <= 15
  AND 5 * l.qty * a.cnt < a.sum_qty
"""


@register("sql_tpch_q17", oracle=TPCH_Q17, covers=["J1", "A2"])
def q_sql_tpch_q17(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): the correlated
    avg-quantity subquery is decorrelated into a per-part rollup CTE
    joined back to the fact — the plan Spark's own decorrelation
    produces, written explicitly so DuckDB runs the identical text.
    The 0.2*avg threshold is integer cross-multiplied, never a float."""
    _views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(_spark_text(TPCH_Q17))


TPCH_Q18 = f"""
WITH li AS ({_LI_CENTS}),
big AS (
    SELECT l_orderkey FROM li GROUP BY l_orderkey HAVING SUM(qty) > 300
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS o_date,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
       CAST(SUM(l.qty) AS BIGINT) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN li l     ON o.o_orderkey = l.l_orderkey
JOIN big b    ON b.l_orderkey = o.o_orderkey
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY totalprice_cents DESC, o.o_orderkey
LIMIT 100
"""


@register("sql_tpch_q18", oracle=TPCH_Q18, covers=["J1", "A2", "O1"])
def q_sql_tpch_q18(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): the IN (GROUP BY ... HAVING)
    subquery becomes a semi-join against the `big` rollup CTE; top-100
    by exact integer total price, tie-broken by order key so LIMIT is
    deterministic."""
    _views(spark, sf_dir, ["lineitem", "customer", "orders"])
    return spark.sql(_spark_text(TPCH_Q18))


# Q19 adapted: reference's (brand, container, quantity, shipmode,
# shipinstruct) disjunction keeps its 3-arm OR shape over the columns
# that exist: (brand, size band, quantity band).
TPCH_Q19 = f"""
WITH li AS ({_LI_CENTS})
SELECT CAST(SUM(l.ep_cents * (100 - l.disc_pct)) AS DOUBLE) / 10000.0 AS revenue
FROM li l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5  AND l.qty BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.qty BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.qty BETWEEN 20 AND 30)
"""


@register("sql_tpch_q19", oracle=TPCH_Q19, covers=["J1", "A2"])
def q_sql_tpch_q19(spark, sf_dir):
    """TPC-H Q19 (discounted revenue): a disjunctive join predicate
    where each arm pairs a part slice with a quantity band; Catalyst
    keeps the equi-key (partkey) join and evaluates the OR as a
    post-join filter with scan-level brand/size pruning."""
    _views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(_spark_text(TPCH_Q19))


# Q22 adapted: reference's phone-country-code slice becomes nationkey
# (no c_phone column); "no orders in 7 years" becomes "no orders since
# 1999". The above-average-balance scalar subquery is integer
# cross-multiplied (bal*cnt > sum) so no float average exists.
TPCH_Q22 = """
WITH bal AS (
    SELECT c_custkey, c_nationkey,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
    FROM customer
),
avg_bal AS (
    SELECT SUM(bal_cents) AS s, COUNT(*) AS c FROM bal WHERE bal_cents > 0
)
SELECT b.c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(b.bal_cents) AS DOUBLE) / 100.0 AS totacctbal
FROM bal b CROSS JOIN avg_bal a
WHERE b.bal_cents * a.c > a.s
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = b.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1999-01-01'
  )
GROUP BY b.c_nationkey
ORDER BY b.c_nationkey
"""


@register("sql_tpch_q22", oracle=TPCH_Q22, covers=["J7", "A2", "O1"])
def q_sql_tpch_q22(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity): above-average-balance
    customers with no recent orders — broadcast scalar aggregate
    (cross join of a 1-row CTE), integer cross-multiplied threshold,
    NOT EXISTS anti-join against the recent-orders slice."""
    _views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(TPCH_Q22)
