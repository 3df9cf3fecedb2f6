"""Pipeline batch 76 (north-star extension): finance/accounting ops —
FIFO inventory allocation, a double-entry trial balance, per-line vs
per-total rounding policy audit, AR aging buckets, and weekly cash
flow.

Exactness discipline: every amount is exact integer cents; FIFO
allocation is the running-sum interval-intersection formulation (pure
relational, no loops); rounding deltas are the exact difference of the
two integer policies."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# FIFO allocation via running-sum interval intersection.

FIFO_SQL = """
WITH l AS (
    SELECT l_partkey % 20 AS grp, l_orderkey, l_linenumber,
           l_partkey, l_suppkey,
           CAST(round(l_quantity) AS BIGINT) AS q,
           CASE WHEN l_orderkey % 2 = 0 THEN 'in' ELSE 'out' END AS side
    FROM lineitem
),
layers AS (
    -- (orderkey, linenumber) repeats in this corpus: partkey/suppkey
    -- complete a TOTAL order so the running sum is engine-independent
    SELECT grp, side, l_orderkey, l_linenumber, q,
           SUM(q) OVER (PARTITION BY grp, side
                        ORDER BY l_orderkey, l_linenumber, l_partkey,
                                 l_suppkey, q
                        ROWS UNBOUNDED PRECEDING) AS hi
    FROM l
),
iv AS (SELECT grp, side, l_orderkey, l_linenumber, q, hi - q AS lo, hi FROM layers),
alloc AS (
    SELECT i.grp,
           i.l_orderkey AS in_order, i.l_linenumber AS in_line,
           o.l_orderkey AS out_order, o.l_linenumber AS out_line,
           least(i.hi, o.hi) - greatest(i.lo, o.lo) AS qty
    FROM iv i JOIN iv o
      ON o.grp = i.grp AND i.side = 'in' AND o.side = 'out'
     AND i.lo < o.hi AND o.lo < i.hi
)
SELECT CAST(grp AS BIGINT) AS grp,
       CAST(in_order AS BIGINT) AS in_order, CAST(in_line AS BIGINT) AS in_line,
       CAST(out_order AS BIGINT) AS out_order, CAST(out_line AS BIGINT) AS out_line,
       CAST(qty AS BIGINT) AS qty
FROM alloc WHERE qty > 0
"""


@register("fifo_allocation", oracle=FIFO_SQL, covers=["J1", "O1", "A2"])
def q_fifo_allocation(spark, sf_dir):
    """FIFO inventory allocation — the classic 'hard SQL' problem done
    relationally: purchases and sales each become consumption intervals
    [cum - q, cum) on their group's running-quantity axis, and a sale
    draws from exactly the purchase layers whose intervals intersect
    its own; the allocated quantity IS the intersection length. No
    loops, no state machine — two windows + one BANDED interval-overlap
    join keyed on (group, bucket).

    The banding is load-bearing, not a footnote: a bare join on the
    20-value group key is a per-group cartesian with a post-filter —
    measured 50 s at sf0.1 (~4.5B pair evaluations) vs ~2 s banded.
    Each consumption interval [lo, hi) explodes into the _BUCKET_W-wide
    buckets it spans (FIFO layers tile the axis, so intervals are
    short — the explode factor is ~1 + q/_BUCKET_W); the equi-join on
    (grp, bucket) generates only co-resident candidates, the strict
    overlap filter keeps real intersections, and each pair is emitted
    exactly once in the FIRST bucket both intervals share (the
    range_join canonical-bucket trick — greatest lo-bucket of the two;
    overlap guarantees that bucket lies in both spans, so no dedup
    shuffle). At 100 TB the (group, bucket) key partitions the axis;
    work scales with co-residency, never |in| x |out|."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    l = li.select(
        (F.col("l_partkey") % 20).alias("grp"),
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_quantity")).cast("long").alias("q"),
        F.when(F.col("l_orderkey") % 2 == 0, "in").otherwise("out").alias("side"),
    )
    # (orderkey, linenumber) repeats in this corpus: partkey/suppkey/q
    # complete a TOTAL order so the running sum is engine-independent
    w = (
        Window.partitionBy("grp", "side")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "q")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    iv = l.withColumn("hi", F.sum("q").over(w)).withColumn(
        "lo", F.col("hi") - F.col("q")
    )
    _BUCKET_W = 64  # ~2.5x the mean layer quantity: explode factor ~1.4
    i = iv.filter(F.col("side") == "in").select(
        "grp",
        F.col("l_orderkey").alias("in_order"),
        F.col("l_linenumber").alias("in_line"),
        F.col("lo").alias("ilo"),
        F.col("hi").alias("ihi"),
        F.explode(
            F.sequence(
                F.expr(f"lo div {_BUCKET_W}"), F.expr(f"hi div {_BUCKET_W}")
            )
        ).alias("_bucket"),
    )
    o = iv.filter(F.col("side") == "out").select(
        "grp",
        F.col("l_orderkey").alias("out_order"),
        F.col("l_linenumber").alias("out_line"),
        F.col("lo").alias("olo"),
        F.col("hi").alias("ohi"),
        F.explode(
            F.sequence(
                F.expr(f"lo div {_BUCKET_W}"), F.expr(f"hi div {_BUCKET_W}")
            )
        ).alias("_bucket"),
    )
    first_shared = F.greatest(
        F.expr(f"ilo div {_BUCKET_W}"), F.expr(f"olo div {_BUCKET_W}")
    )
    alloc = (
        i.join(o, ["grp", "_bucket"])
        .filter(
            (F.col("ilo") < F.col("ohi"))
            & (F.col("olo") < F.col("ihi"))
            & (F.col("_bucket") == first_shared)
        )
        .select(
            F.col("grp").cast("long").alias("grp"),
            F.col("in_order").cast("long").alias("in_order"),
            F.col("in_line").cast("long").alias("in_line"),
            F.col("out_order").cast("long").alias("out_order"),
            F.col("out_line").cast("long").alias("out_line"),
            (
                F.least("ihi", "ohi") - F.greatest("ilo", "olo")
            ).cast("long").alias("qty"),
        )
        .filter(F.col("qty") > 0)
    )
    return alloc


# ---------------------------------------------------------------------------
# double-entry trial balance.

TRIAL_SQL = """
WITH entries AS (
    SELECT 'cash' AS account,
           CAST(round(o_totalprice * 100) AS BIGINT) AS debit,
           CAST(0 AS BIGINT) AS credit
    FROM orders
    UNION ALL
    SELECT 'revenue', 0, CAST(round(o_totalprice * 100) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'refunds_expense',
           CAST(round(l_extendedprice * 100) AS BIGINT), 0
    FROM lineitem WHERE l_returnflag = 'R'
    UNION ALL
    SELECT 'cash', 0, CAST(round(l_extendedprice * 100) AS BIGINT)
    FROM lineitem WHERE l_returnflag = 'R'
)
SELECT account,
       CAST(SUM(debit) AS BIGINT) AS debits_cents,
       CAST(SUM(credit) AS BIGINT) AS credits_cents,
       CAST(SUM(debit) - SUM(credit) AS BIGINT) AS balance_cents
FROM entries GROUP BY account
"""


@register("trial_balance_audit", oracle=TRIAL_SQL, covers=["A2", "O5"])
def q_trial_balance_audit(spark, sf_dir):
    """Double-entry trial balance: orders book cash-debit/revenue-credit,
    returns book expense-debit/cash-credit — per-account debit/credit
    totals whose GRAND totals must be equal (every entry posts both
    sides; the pytest asserts the invariant). One union of narrow
    passes + one rollup, exact cents."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    oc = F.round(F.col("o_totalprice") * 100).cast("long")
    lc = F.round(F.col("l_extendedprice") * 100).cast("long")
    zero = F.lit(0).cast("long")
    entries = (
        orders.select(F.lit("cash").alias("account"), oc.alias("debit"), zero.alias("credit"))
        .unionAll(orders.select(F.lit("revenue"), zero, oc))
        .unionAll(
            li.filter(F.col("l_returnflag") == "R").select(
                F.lit("refunds_expense"), lc, zero
            )
        )
        .unionAll(
            li.filter(F.col("l_returnflag") == "R").select(F.lit("cash"), zero, lc)
        )
    )
    return entries.groupBy("account").agg(
        F.sum("debit").cast("long").alias("debits_cents"),
        F.sum("credit").cast("long").alias("credits_cents"),
        (F.sum("debit") - F.sum("credit")).cast("long").alias("balance_cents"),
    )


# ---------------------------------------------------------------------------
# rounding-policy audit: per-line vs per-invoice tax rounding.

ROUNDING_SQL = """
WITH l AS (
    SELECT l_orderkey,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
           CAST(round(l_tax * 100) AS BIGINT) AS tax_pct
    FROM lineitem
),
per_line AS (
    SELECT l_orderkey,
           SUM((cents * tax_pct + 50) // 100) AS tax_lines,
           SUM(cents * tax_pct) AS tax_raw
    FROM l GROUP BY l_orderkey
)
SELECT l_orderkey,
       CAST(tax_lines AS BIGINT) AS tax_per_line_cents,
       CAST((tax_raw + 50) // 100 AS BIGINT) AS tax_per_invoice_cents,
       CAST(tax_lines - (tax_raw + 50) // 100 AS BIGINT) AS policy_delta_cents
FROM per_line
WHERE tax_lines <> (tax_raw + 50) // 100
"""


@register("rounding_policy_report", oracle=ROUNDING_SQL, covers=["A2", "P7"])
def q_rounding_policy_report(spark, sf_dir):
    """Tax rounding-policy audit: invoices where rounding the tax per
    LINE (sum of half-up-rounded line taxes) differs from rounding once
    per INVOICE — the accounting discrepancy class auditors hunt.
    Both policies computed in exact integer arithmetic ((x + 50) div
    100 = half-up on cents); only differing invoices emitted."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    l = li.select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.round(F.col("l_tax") * 100).cast("long").alias("tax_pct"),
    )
    per_line = l.groupBy("l_orderkey").agg(
        F.sum(F.expr("(cents * tax_pct + 50) div 100")).alias("tax_lines"),
        F.sum(F.col("cents") * F.col("tax_pct")).alias("tax_raw"),
    )
    return per_line.select(
        "l_orderkey",
        F.col("tax_lines").cast("long").alias("tax_per_line_cents"),
        F.expr("CAST((tax_raw + 50) div 100 AS BIGINT)").alias(
            "tax_per_invoice_cents"
        ),
        F.expr(
            "CAST(tax_lines - (tax_raw + 50) div 100 AS BIGINT)"
        ).alias("policy_delta_cents"),
    ).filter(F.col("tax_per_line_cents") != F.col("tax_per_invoice_cents"))


# ---------------------------------------------------------------------------
# AR aging buckets.

AGING_SQL = """
WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS asof FROM orders),
o AS (
    SELECT o_orderstatus AS status,
           date_diff('day', CAST(o_orderdate AS DATE), mx.asof) AS age_days,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders CROSS JOIN mx
),
b AS (
    SELECT status,
           CASE WHEN age_days <= 30 THEN '0_current'
                WHEN age_days <= 90 THEN '1_31_90'
                WHEN age_days <= 365 THEN '2_91_365'
                ELSE '3_over_365' END AS bucket,
           cents
    FROM o
)
SELECT status, bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM b GROUP BY status, bucket
"""


@register("ar_aging_report", oracle=AGING_SQL, covers=["A2", "F16"])
def q_ar_aging_report(spark, sf_dir):
    """Accounts-receivable aging: order value bucketed by age versus
    the book's as-of date (its newest order), split by order status —
    the collections report every finance close produces. Ages are exact
    integer day differences; the as-of date is a broadcast single
    row."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    mx = orders.agg(F.max(F.to_date("o_orderdate")).alias("asof"))
    o = orders.join(F.broadcast(mx)).select(
        F.col("o_orderstatus").alias("status"),
        F.datediff("asof", F.to_date("o_orderdate")).alias("age_days"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    bucket = (
        F.when(F.col("age_days") <= 30, "0_current")
        .when(F.col("age_days") <= 90, "1_31_90")
        .when(F.col("age_days") <= 365, "2_91_365")
        .otherwise("3_over_365")
    )
    return o.select("status", bucket.alias("bucket"), "cents").groupBy(
        "status", "bucket"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("cents"),
    )


# ---------------------------------------------------------------------------
# weekly cash flow with running balance.

CASHFLOW_SQL = """
WITH flows AS (
    SELECT strftime(date_trunc('week', CAST(o_orderdate AS DATE)), '%Y-%m-%d')
               AS week,
           CAST(round(o_totalprice * 100) AS BIGINT) AS inflow,
           CAST(0 AS BIGINT) AS outflow
    FROM orders
    UNION ALL
    SELECT strftime(date_trunc('week', CAST(l_shipdate AS DATE)), '%Y-%m-%d'),
           0, CAST(round(l_extendedprice * 100) AS BIGINT)
    FROM lineitem WHERE l_returnflag = 'R'
),
g AS (
    SELECT week, SUM(inflow) AS inflow, SUM(outflow) AS outflow
    FROM flows GROUP BY week
)
SELECT week, CAST(inflow AS BIGINT) AS inflow_cents,
       CAST(outflow AS BIGINT) AS outflow_cents,
       CAST(inflow - outflow AS BIGINT) AS net_cents,
       CAST(SUM(inflow - outflow) OVER (ORDER BY week
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS running_balance_cents
FROM g
"""


@register("cashflow_weekly", oracle=CASHFLOW_SQL, covers=["A2", "O1", "O5"])
def q_cashflow_weekly(spark, sf_dir):
    """Weekly cash flow: order inflows vs return outflows netted per
    ISO week with the running balance — the treasury view. The
    cumulative window runs over the bounded weekly series; flows are
    one union of two narrow passes, exact cents."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    zero = F.lit(0).cast("long")
    flows = orders.select(
        F.date_format(F.date_trunc("week", "o_orderdate"), "yyyy-MM-dd").alias(
            "week"
        ),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("inflow"),
        zero.alias("outflow"),
    ).unionAll(
        li.filter(F.col("l_returnflag") == "R").select(
            F.date_format(F.date_trunc("week", "l_shipdate"), "yyyy-MM-dd"),
            zero,
            F.round(F.col("l_extendedprice") * 100).cast("long"),
        )
    )
    g = flows.groupBy("week").agg(
        F.sum("inflow").alias("inflow"), F.sum("outflow").alias("outflow")
    )
    w = Window.orderBy("week").rowsBetween(Window.unboundedPreceding, 0)
    return g.select(
        "week",
        F.col("inflow").cast("long").alias("inflow_cents"),
        F.col("outflow").cast("long").alias("outflow_cents"),
        (F.col("inflow") - F.col("outflow")).cast("long").alias("net_cents"),
        F.sum(F.col("inflow") - F.col("outflow"))
        .over(w)
        .cast("long")
        .alias("running_balance_cents"),
    )
