"""Pipeline batch 46: TPC-H surface COMPLETION — Q2, Q4, Q9, Q11, Q12,
Q16, Q20, Q21. Batch 25 documented these as blocked: the testdata has
no ``partsupp`` table and lineitem lacks commit/receipt dates and ship
mode. This batch derives the missing pieces DETERMINISTICALLY from the
existing keys — both engines build byte-identical derived tables, so
the oracle checks the real query algebra (correlated min-cost
subqueries, EXISTS chains, group-wise fractions) over shared inputs:

- ``partsupp``: 4 suppliers per part, ps_suppkey = (p_partkey +
  29k) % 100 (distinct offsets), availqty and supplycost_cents as
  fixed affine-mod functions of the keys;
- ``l_commitdate`` = shipdate + ((orderkey + linenumber) % 61 - 30)
  days, ``l_receiptdate`` = shipdate + ((3*orderkey + linenumber) %
  30 + 1) days, ``l_shipmode`` in {MAIL, SHIP, AIR} by key residue.
- Columns TPC-H selects but the schema lacks (p_mfgr, s_address,
  s_phone, comments) are trimmed from the outputs; every JOIN,
  subquery and predicate shape is intact. Q2's type/region and Q20's
  name-prefix literals are adapted to the synthetic vocabulary.

ONE SQL text per query runs verbatim on BOTH engines (the batch-20
``WITH RECURSIVE``/TPC-H pattern): date arithmetic is DATE + integer
(portable), money is exact BIGINT cents/cent-pct with a single final
division, fractions compare by integer cross-multiplication.

Scale notes: identical to the classic plans — dimension chains
broadcast, correlated subqueries decorrelate to aggregate-joins under
Catalyst, EXISTS/NOT EXISTS become semi/anti hash joins (asserted for
Q21 in the plan audit).
"""

from __future__ import annotations

from prosnet_prefect_pipelines_spark.plans.catalog import register
from prosnet_prefect_pipelines_spark.plans.q_pipeline20 import _register_views

_DERIVED = """
partsupp AS (
    SELECT p.p_partkey AS ps_partkey,
           (p.p_partkey + 29 * k.k) % 100 AS ps_suppkey,
           (p.p_partkey * 31 + ((p.p_partkey + 29 * k.k) % 100) * 17) % 9999 + 1
               AS ps_availqty,
           (p.p_partkey * 53 + ((p.p_partkey + 29 * k.k) % 100) * 29) % 100000 + 100
               AS ps_supplycost_cents
    FROM part p
    CROSS JOIN (SELECT 0 AS k UNION ALL SELECT 1 UNION ALL SELECT 2
                UNION ALL SELECT 3) k
),
xlineitem AS (
    SELECT l.*,
           CAST(l.l_shipdate AS DATE) AS ship_d,
           CAST(l.l_shipdate AS DATE)
               + CAST((l.l_orderkey + l.l_linenumber) % 61 - 30 AS INTEGER)
               AS commit_d,
           CAST(l.l_shipdate AS DATE)
               + CAST((3 * l.l_orderkey + l.l_linenumber) % 30 + 1 AS INTEGER)
               AS receipt_d,
           CASE (l.l_orderkey + l.l_linenumber) % 3
               WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' ELSE 'AIR' END AS shipmode
    FROM lineitem l
)
"""

TPCH_Q2 = f"""
WITH {_DERIVED}
SELECT CAST(ROUND(s.s_acctbal * 100) AS BIGINT) AS s_acctbal_cents,
       s.s_name, n.n_name, p.p_partkey, p.p_type,
       CAST(ps.ps_supplycost_cents AS BIGINT) AS supplycost_cents
FROM part p
JOIN partsupp ps ON ps.ps_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE p.p_size = 11 AND p.p_type = 'ECONOMY' AND r.r_name = 'EUROPE'
  AND ps.ps_supplycost_cents = (
      SELECT MIN(ps2.ps_supplycost_cents)
      FROM partsupp ps2
      JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
      JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
      JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
      WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY s_acctbal_cents DESC, n.n_name, s.s_name, p.p_partkey
LIMIT 100
"""

TPCH_Q4 = f"""
WITH {_DERIVED}
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= DATE '1995-07-01'
  AND o.o_orderdate < DATE '1995-10-01'
  AND EXISTS (
      SELECT 1 FROM xlineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.commit_d < l.receipt_d
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""

TPCH_Q9 = f"""
WITH {_DERIVED},
profit AS (
    SELECT n.n_name AS nation,
           year(o.o_orderdate) AS o_year,
           CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
           - ps.ps_supplycost_cents * CAST(l.l_quantity AS BIGINT) * 100
               AS amount_centpct
    FROM part p
    JOIN xlineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN partsupp ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%gear%'
)
SELECT nation, CAST(o_year AS BIGINT) AS o_year,
       CAST(SUM(amount_centpct) AS DOUBLE) / 10000.0 AS sum_profit
FROM profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""

TPCH_Q11 = f"""
WITH {_DERIVED},
val AS (
    SELECT ps.ps_partkey,
           SUM(ps.ps_supplycost_cents * ps.ps_availqty) AS value_cents
    FROM partsupp ps
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_7'
    GROUP BY ps.ps_partkey
),
tot AS (SELECT SUM(value_cents) AS t FROM val)
SELECT v.ps_partkey, CAST(v.value_cents AS BIGINT) AS value_cents
FROM val v, tot
WHERE v.value_cents * 1000 > tot.t
ORDER BY v.value_cents DESC, v.ps_partkey
"""

TPCH_Q12 = f"""
WITH {_DERIVED}
SELECT l.shipmode,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN xlineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.shipmode IN ('MAIL', 'SHIP')
  AND l.commit_d < l.receipt_d
  AND l.ship_d < l.commit_d
  AND l.receipt_d >= DATE '1996-01-01'
  AND l.receipt_d < DATE '1997-01-01'
GROUP BY l.shipmode
ORDER BY l.shipmode
"""

TPCH_Q16 = f"""
WITH {_DERIVED}
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp ps
JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#2'
  AND p.p_type NOT LIKE 'ECONOMY%'
  AND p.p_size IN (5, 11, 17, 23, 29, 35, 41, 47)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p_size
LIMIT 100
"""

TPCH_Q20 = f"""
WITH {_DERIVED}
SELECT s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (
    SELECT ps.ps_suppkey FROM partsupp ps
    WHERE ps.ps_partkey IN (
        SELECT p.p_partkey FROM part p WHERE p.p_name LIKE 'red%'
    )
    AND 2 * ps.ps_availqty > (
        SELECT COALESCE(SUM(CAST(l.l_quantity AS BIGINT)), 0)
        FROM xlineitem l
        WHERE l.l_partkey = ps.ps_partkey AND l.l_suppkey = ps.ps_suppkey
          AND l.ship_d >= DATE '1996-01-01' AND l.ship_d < DATE '1997-01-01'
    )
)
ORDER BY s.s_name
"""

TPCH_Q21 = f"""
WITH {_DERIVED}
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN xlineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.receipt_d > l1.commit_d
  AND n.n_name = 'NATION_3'
  AND EXISTS (
      SELECT 1 FROM xlineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM xlineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.receipt_d > l3.commit_d
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100
"""

_ALL = {
    "sql_tpch_q2": (TPCH_Q2, ["J1", "O1", "A2"]),
    "sql_tpch_q4": (TPCH_Q4, ["J7", "A2", "F16"]),
    "sql_tpch_q9": (TPCH_Q9, ["J1", "A2", "F16"]),
    "sql_tpch_q11": (TPCH_Q11, ["J1", "A2", "O1"]),
    "sql_tpch_q12": (TPCH_Q12, ["J1", "A2", "F16"]),
    "sql_tpch_q16": (TPCH_Q16, ["A1", "A2", "O1"]),
    "sql_tpch_q20": (TPCH_Q20, ["J7", "A2", "F16"]),
    "sql_tpch_q21": (TPCH_Q21, ["J7", "J1", "A2"]),
}

_TABLES = ["part", "supplier", "nation", "region", "orders", "lineitem", "customer"]


def _make(name: str, sql: str):
    def run(spark, sf_dir):
        _register_views(spark, sf_dir, _TABLES)
        return spark.sql(sql)

    run.__name__ = f"q_{name}"
    run.__doc__ = (
        f"TPC-H {name.split('_')[-1].upper()} over the deterministically "
        "derived partsupp/commit/receipt/shipmode columns — ONE SQL text "
        "run verbatim on both engines; the algebra (correlated min-cost "
        "subqueries, EXISTS/NOT EXISTS chains, group fractions by integer "
        "cross-multiplication) is the classic plan, exact-integer money."
    )
    return run


for _name, (_sql, _covers) in _ALL.items():
    register(_name, oracle=_sql, covers=_covers)(_make(_name, _sql))
