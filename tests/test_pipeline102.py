"""Unit tests for batch-102: forensic data-quality analytics.

Known-value checks: Benford report on a hand-built digit distribution,
Nigrini MAD on a perfectly-conforming feed (MAD=0 up to 6-dp count
granularity), the uniformity chi-square against the closed form
(K*S2 - n^2)/n, round-number spikes on a crafted cents mix, duplicate
concentration on an explicit multiplicity profile, and digit entropy
on a two-value distribution with ln(2) closed form.
"""

from __future__ import annotations

import datetime as dt
import math

ORDERS_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
]


def _write_orders_prices(spark, path, prices, priority="3-MEDIUM"):
    rows = [
        (i, i, "O", p, dt.datetime(1996, 3, 1), priority)
        for i, p in enumerate(prices, start=1)
    ]
    spark.createDataFrame(rows, ORDERS_COLS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/orders.parquet")


def test_benford_report_counts_and_chi2(spark, tmp_path):
    """3 prices leading with 1, 1 leading with 9; digits 2-8 report
    obs=0 with chi2 term == expected."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline102 import (
        q_benford_first_digit_report,
    )

    _write_orders_prices(spark, tmp_path, [10.00, 11.11, 199.99, 90.01])
    out = {r.digit: r for r in q_benford_first_digit_report(spark, str(tmp_path)).collect()}
    assert sorted(out) == list(range(1, 10))
    assert out[1].obs_count == 3 and out[9].obs_count == 1
    n = 4
    p1 = 0.301030
    exp1 = round(n * p1, 6)
    assert abs(out[1].expected_6 - exp1) <= 1e-9
    assert abs(out[1].chi2_term_6 - round((3 - n * p1) ** 2 / (n * p1), 6)) <= 1e-9
    # an absent digit contributes (0 - np)^2/(np) == np
    p5 = 0.079181
    assert out[5].obs_count == 0
    assert abs(out[5].chi2_term_6 - round(n * p5, 6)) <= 1e-9


def test_benford_mad_perfect_conformity(spark, tmp_path):
    """A 1e6-scaled Benford-exact feed: 301030 ones .. 45757 nines
    is infeasible as a unit test, so use the closed form the other
    way — a single-digit feed has MAD = (|1-p1| + sum_d p_d)/9."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline102 import (
        q_benford_mad_nigrini,
    )

    _write_orders_prices(spark, tmp_path, [10.00, 12.34, 15.00])
    r = q_benford_mad_nigrini(spark, str(tmp_path)).collect()[0]
    assert r.n_orders == 3
    ps = [0.301030, 0.176091, 0.124939, 0.096910, 0.079181,
          0.066947, 0.057992, 0.051153, 0.045757]
    mad = (abs(1.0 - ps[0]) + sum(ps[1:])) / 9
    assert abs(r.mad_6 - round(mad, 6)) <= 2e-6
    assert r.conformity == "nonconforming"


def test_cents_uniformity_closed_form(spark, tmp_path):
    """Cents 00 x3, 50 x1: S2 = 10, n = 4, chi2 = (100*10 - 16)/4."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline102 import (
        q_cents_uniformity_chi2,
    )

    _write_orders_prices(spark, tmp_path, [10.00, 11.00, 12.00, 13.50])
    r = q_cents_uniformity_chi2(spark, str(tmp_path)).collect()[0]
    assert r.n_orders == 4 and r.cells_present == 2
    assert r.max_cell_count == 3 and r.max_cell_digits == 0
    assert abs(r.chi2_6 - round((100 * 10 - 16) / 4.0, 6)) <= 1e-9


def test_cents_uniformity_tie_breaks_to_min_digits(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline102 import (
        q_cents_uniformity_chi2,
    )

    _write_orders_prices(spark, tmp_path, [10.99, 11.50, 12.99, 13.50])
    r = q_cents_uniformity_chi2(spark, str(tmp_path)).collect()[0]
    # 50 and 99 both have count 2 -> min digit pair (50) wins
    assert r.max_cell_count == 2 and r.max_cell_digits == 50


def test_round_price_spike_counts(spark, tmp_path):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline102 import (
        q_round_price_spike,
    )

    _write_orders_prices(
        spark, tmp_path, [10.00, 11.50, 12.99, 13.13, 14.00], priority="1-URGENT"
    )
    rows = q_round_price_spike(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.o_orderpriority == "1-URGENT"
    assert (r.n_orders, r.c00, r.c50, r.c99) == (5, 2, 1, 1)
    assert abs(r.spike_share_6 - round(4 / 5, 6)) <= 1e-9


def test_duplicate_amount_concentration_profile(spark, tmp_path):
    """Multiplicities {3, 2, 1, 1}: 7 rows, 4 amounts, 2 dup amounts,
    5 rows in dups."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline102 import (
        q_duplicate_amount_concentration,
    )

    prices = [10.11] * 3 + [20.22] * 2 + [30.33, 40.44]
    _write_orders_prices(spark, tmp_path, prices)
    r = q_duplicate_amount_concentration(spark, str(tmp_path)).collect()[0]
    assert (r.n_orders, r.distinct_amounts, r.dup_amounts) == (7, 4, 2)
    assert (r.max_multiplicity, r.rows_in_dups) == (3, 5)
    assert abs(r.dup_row_share_6 - round(5 / 7, 6)) <= 1e-9


def test_digit_entropy_two_value_ln2(spark, tmp_path):
    """2 distinct first digits and 2 distinct cents cells, each 50/50:
    both entropies == ln(2) to term granularity."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline102 import (
        q_amount_digit_entropy,
    )

    _write_orders_prices(spark, tmp_path, [10.00, 10.00, 90.50, 90.50])
    r = q_amount_digit_entropy(spark, str(tmp_path)).collect()[0]
    ln2 = math.log(2.0)
    assert r.n_orders == 4
    assert abs(r.first_digit_entropy - ln2) <= 2e-6
    assert abs(r.cents_entropy - ln2) <= 2e-6
    assert abs(r.first_digit_efficiency - round(round(ln2, 6) / 2.197225, 6)) <= 2e-6
    assert abs(r.cents_efficiency - round(round(ln2, 6) / 4.605170, 6)) <= 2e-6
