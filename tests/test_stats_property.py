"""Property tests: round-5 exact statistics vs independent pure-Python
reference implementations on generated inputs.

The batch-97/99 queries compute rank / order-statistic / moment values
through distinct-value cumulative-count identities (tie blocks, doubled
ranks, shifted power sums). Each property here recomputes the statistic
the NAIVE way — sort the list, rank it, slice it — and requires
agreement, pinning the identity algebra far beyond the hand examples.
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

_cents = st.integers(min_value=1, max_value=500)
_cents_list = st.lists(_cents, min_size=2, max_size=25)


def _round6(x: float) -> float:
    """HALF_UP 6-dp rounding — what Spark's round() and DuckDB's round()
    both do. Python's round() is half-EVEN, so a reference value landing
    exactly on a .5e-6 tie (easy with small-integer ratios: 212/512 =
    0.4140625) disagrees by 1e-6 and fails the 1e-9 tolerance (found by
    hypothesis in r11's full suite on gini)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def _write_orders_cents(spark, path, cents_list, year=1995):
    rows = [
        (i, i, "O", c / 100.0, dt.datetime(year, 6, 1), "3-MEDIUM")
        for i, c in enumerate(cents_list, start=1)
    ]
    spark.createDataFrame(
        rows,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")


def _avg_ranks(values):
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and values[order[j + 1]] == values[order[i]]:
            j += 1
        avg = (i + j) / 2 + 1
        for k in range(i, j + 1):
            ranks[order[k]] = avg
        i = j + 1
    return ranks


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture]
)
@given(st.lists(st.tuples(_cents, _cents), min_size=2, max_size=15))
def test_wilcoxon_matches_naive_ranking(spark, tmp_path, pairs):
    """w_plus_x2 from the distinct-|d| doubled-rank cumulation equals
    2 * sum of naive average ranks of positive differences."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline97 import (
        q_wilcoxon_signed_rank,
    )

    diffs = [b - a for a, b in pairs if b != a]
    assume(diffs)
    rows, ok = [], 0
    for cust, (a, b) in enumerate(pairs, start=1):
        ok += 1
        rows.append(
            (ok, cust, "O", a / 100.0, dt.datetime(1995, 6, 1), "3-MEDIUM")
        )
        ok += 1
        rows.append(
            (ok, cust, "O", b / 100.0, dt.datetime(1996, 6, 1), "3-MEDIUM")
        )
    spark.createDataFrame(
        rows,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")

    got = q_wilcoxon_signed_rank(spark, str(tmp_path)).collect()[0]
    ranks = _avg_ranks([abs(d) for d in diffs])
    wp2 = round(2 * sum(r for r, d in zip(ranks, diffs) if d > 0))
    assert got["n"] == len(diffs)
    assert got["w_plus_x2"] == wp2
    assert got["w_plus_x2"] + got["w_minus_x2"] == len(diffs) * (
        len(diffs) + 1
    )


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture]
)
@given(_cents_list)
def test_gini_matches_sorted_rank_formula(spark, tmp_path, cents):
    """Tie-block positional identity == naive sorted row_number Gini."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline97 import (
        q_gini_customer_spend,
    )

    _write_orders_cents(spark, tmp_path, cents)
    got = q_gini_customer_spend(spark, str(tmp_path)).collect()[0]
    s = sorted(cents)
    n, tot = len(s), sum(s)
    g = (2 * sum(i * x for i, x in enumerate(s, start=1)) - (n + 1) * tot) / (
        n * tot
    )
    assert got["n"] == n and got["total_cents"] == tot
    assert abs(got["gini"] - _round6(g)) <= 1e-9


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture]
)
@given(_cents_list)
def test_trimmed_mean_matches_sorted_slice(spark, tmp_path, cents):
    """Partial tie-block tail sums == naive sorted-slice trimmed mean."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline99 import (
        q_trimmed_mean_orders,
    )

    _write_orders_cents(spark, tmp_path, cents)
    got = q_trimmed_mean_orders(spark, str(tmp_path)).collect()[0]
    s = sorted(cents)
    k = len(s) // 10
    mid = s[k : len(s) - k]
    ref = sum(mid) / len(mid) / 100.0
    assert got["trimmed_each"] == k
    assert abs(got["trimmed_mean_dollars"] - _round6(ref)) <= 1e-9


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture]
)
@given(_cents_list)
def test_bowley_quartiles_match_inverse_ecdf(spark, tmp_path, cents):
    """Distinct-value cumulative quartiles == naive sorted type-1
    quantiles q_p = s[ceil(p*n) - 1]."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline99 import (
        q_bowley_quartile_skew,
    )

    _write_orders_cents(spark, tmp_path, cents)
    got = q_bowley_quartile_skew(spark, str(tmp_path)).collect()[0]
    s = sorted(cents)
    n = len(s)
    q1 = s[math.ceil(0.25 * n) - 1]
    q2 = s[math.ceil(0.50 * n) - 1]
    q3 = s[math.ceil(0.75 * n) - 1]
    assert (got["q1_cents"], got["q2_cents"], got["q3_cents"]) == (q1, q2, q3)
    if q3 != q1:
        ref = (q3 + q1 - 2 * q2) / (q3 - q1)
        assert abs(got["bowley_skew"] - _round6(ref)) <= 1e-9
    else:
        assert got["bowley_skew"] is None


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture]
)
@given(_cents_list)
def test_moments_match_naive_central_moments(spark, tmp_path, cents):
    """Shifted power-sum combination == naive two-pass central moments."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline99 import (
        q_skewness_kurtosis_exact,
    )

    assume(len(set(cents)) >= 2)
    _write_orders_cents(spark, tmp_path, cents)
    got = q_skewness_kurtosis_exact(spark, str(tmp_path)).collect()[0]
    n = len(cents)
    mean = sum(cents) / n
    m2 = sum((x - mean) ** 2 for x in cents) / n
    m3 = sum((x - mean) ** 3 for x in cents) / n
    m4 = sum((x - mean) ** 4 for x in cents) / n
    assert got["n"] == n
    assert got["skewness"] == round(got["skewness"], 6)
    assert abs(got["skewness"] - m3 / m2**1.5) <= 1e-4
    assert abs(got["excess_kurtosis"] - (m4 / m2**2 - 3)) <= 1e-4


# ---------------------------------------------------------------------------
# batch 102/103 properties: forensic digit screens and time-series
# diagnostics vs naive pure-Python loops.

_series = st.lists(_cents, min_size=3, max_size=20)


def _write_monthly_cents(spark, path, cents_list):
    rows = [
        (i, i, "O", c / 100.0,
         dt.datetime(1996 + (i - 1) // 12, (i - 1) % 12 + 1, 5), "3-MEDIUM")
        for i, c in enumerate(cents_list, start=1)
    ]
    spark.createDataFrame(
        rows,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture]
)
@given(_series)
def test_mann_kendall_matches_naive_pairs(spark, tmp_path, cents):
    """Pair-join S and tie-corrected variance == the O(n^2) loop."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline103 import (
        q_mann_kendall_monthly,
    )

    _write_monthly_cents(spark, tmp_path, cents)
    got = q_mann_kendall_monthly(spark, str(tmp_path)).collect()[0]
    n = len(cents)
    s = sum(
        (cents[j] > cents[i]) - (cents[j] < cents[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tie = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(cents).values() if t > 1
    )
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18
    assert got["n_months"] == n and got["s_stat"] == s
    assert abs(got["var_s_6"] - _round6(var)) <= 1e-9
    if var > 0:
        z = (s - 1) / var**0.5 if s > 0 else ((s + 1) / var**0.5 if s < 0 else 0.0)
        assert abs(got["z_6"] - _round6(z)) <= 1e-9


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture]
)
@given(_series)
def test_series_diagnostics_match_naive_loops(spark, tmp_path, cents):
    """Turning points, records, drawdown, monotone runs and mean
    crossings all equal direct scans of the series."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline103 import (
        q_mean_crossings_monthly,
        q_monotone_runs_monthly,
        q_record_months_monthly,
        q_revenue_drawdown_monthly,
        q_turning_points_monthly,
    )

    _write_monthly_cents(spark, tmp_path, cents)
    sf = str(tmp_path)
    n = len(cents)

    tp = q_turning_points_monthly(spark, sf).collect()[0]
    naive_tp = sum(
        1
        for i in range(1, n - 1)
        if (cents[i] > cents[i - 1] and cents[i] > cents[i + 1])
        or (cents[i] < cents[i - 1] and cents[i] < cents[i + 1])
    )
    assert tp["turning_points"] == naive_tp

    rec = q_record_months_monthly(spark, sf).collect()[0]
    hi = sum(1 for i in range(n) if i == 0 or cents[i] > max(cents[:i]))
    lo = sum(1 for i in range(n) if i == 0 or cents[i] < min(cents[:i]))
    assert (rec["record_highs"], rec["record_lows"]) == (hi, lo)

    dd = q_revenue_drawdown_monthly(spark, sf).collect()[0]
    peak, best, bk, bp = cents[0], -1, None, None
    for i, x in enumerate(cents, start=1):
        peak = max(peak, x)
        if peak - x > best:
            best, bk, bp = peak - x, i, peak
    assert dd["max_drawdown_cents"] == best
    assert dd["trough_month_key"] == 1996 * 12 + bk
    assert dd["peak_cents"] == bp

    mr = q_monotone_runs_monthly(spark, sf).collect()[0]
    lu = ld = cu = cd = 0
    for i in range(1, n):
        cu = cu + 1 if cents[i] > cents[i - 1] else 0
        cd = cd + 1 if cents[i] < cents[i - 1] else 0
        lu, ld = max(lu, cu), max(ld, cd)
    assert (mr["longest_up_steps"], mr["longest_down_steps"]) == (lu, ld)

    mc = q_mean_crossings_monthly(spark, sf).collect()[0]
    tot = sum(cents)
    sgn = [(n * x > tot) - (n * x < tot) for x in cents]
    cross = sum(
        1 for a, b in zip(sgn, sgn[1:]) if a * b == -1
    )
    assert mc["crossings"] == cross
    assert mc["n_above"] == sum(1 for v in sgn if v == 1)
    assert mc["n_below"] == sum(1 for v in sgn if v == -1)
    assert mc["n_equal"] == sum(1 for v in sgn if v == 0)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture]
)
@given(st.lists(st.integers(min_value=100, max_value=99999), min_size=1, max_size=20))
def test_benford_report_matches_counter(spark, tmp_path, cents):
    """Per-digit observed counts == Counter of leading digits; chi2
    terms recompute from the literal probabilities."""
    from collections import Counter

    from prosnet_prefect_pipelines_spark.plans.q_pipeline102 import (
        _BENFORD_P,
        q_benford_first_digit_report,
        q_cents_uniformity_chi2,
    )

    _write_orders_cents(spark, tmp_path, cents)
    out = {
        r["digit"]: r
        for r in q_benford_first_digit_report(spark, str(tmp_path)).collect()
    }
    obs = Counter(int(str(c)[0]) for c in cents)
    n = len(cents)
    for d, p in _BENFORD_P:
        assert out[d]["obs_count"] == obs.get(d, 0)
        assert abs(out[d]["expected_6"] - _round6(n * p)) <= 1e-9
        assert (
            abs(
                out[d]["chi2_term_6"]
                - _round6((obs.get(d, 0) - n * p) ** 2 / (n * p))
            )
            <= 1e-9
        )

    uni = q_cents_uniformity_chi2(spark, str(tmp_path)).collect()[0]
    cells = Counter(c % 100 for c in cents)
    naive = sum(
        (cells.get(ll, 0) - n / 100) ** 2 / (n / 100) for ll in range(100)
    )
    assert abs(uni["chi2_6"] - _round6(naive)) <= 1e-6
    assert uni["cells_present"] == len(cells)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture]
)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10), st.booleans()),
        min_size=2,
        max_size=30,
    )
)
def test_auc_rank_identity_matches_naive_pairs(spark, tmp_path, items):
    """Doubled-rank AUC == naive (wins + ties/2) / (n1*n0) pair count
    — the tie-averaging case most AUC implementations get wrong."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from prosnet_prefect_pipelines_spark.plans.q_pipeline105 import (
        q_auc_exact_rank,
    )

    assume(any(y for _, y in items) and any(not y for _, y in items))
    rows = [
        (i, s / 100.0, "R" if y else "N")
        for i, (s, y) in enumerate(items, start=1)
    ]
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_discount", "l_returnflag"])
    pq.write_table(pa.Table.from_pandas(df), f"{tmp_path}/lineitem.parquet")

    got = q_auc_exact_rank(spark, str(tmp_path)).collect()[0]
    pos = [s for s, y in items if y]
    neg = [s for s, y in items if not y]
    wins = sum(1 for p in pos for q in neg if p > q)
    ties = sum(1 for p in pos for q in neg if p == q)
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert (got["n_pos"], got["n_neg"]) == (len(pos), len(neg))
    assert abs(got["auc_6"] - _round6(auc)) <= 1e-9


@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture]
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10),
            st.integers(min_value=1, max_value=500),
        ),
        min_size=2,
        max_size=12,
    )
)
def test_kendall_distance_matches_naive_pairs(spark, tmp_path, items):
    """Query ranks == naive rank assignment; discordant == O(n^2) loop."""
    import datetime as _dt

    from prosnet_prefect_pipelines_spark.plans.q_pipeline107 import (
        q_kendall_rank_distance,
    )

    rows = [
        (i, 1, "O", cents / 100.0, _dt.datetime(1996, 3, 1), "3-MEDIUM")
        for i, (_, cents) in enumerate(items, start=1)
    ]
    spark.createDataFrame(
        rows,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    li = pd.DataFrame(
        [(i, s / 100.0, "N") for i, (s, _) in enumerate(items, start=1)],
        columns=["l_orderkey", "l_discount", "l_returnflag"],
    )
    pq.write_table(pa.Table.from_pandas(li), f"{tmp_path}/lineitem.parquet")

    got = q_kendall_rank_distance(spark, str(tmp_path)).collect()[0]
    n = len(items)
    # naive ranks with the query's deterministic tie-breaks
    by_s = sorted(range(n), key=lambda i: (-items[i][0], i + 1))
    by_v = sorted(range(n), key=lambda i: (-items[i][1], i + 1))
    ra = {i + 1: p + 1 for p, i in enumerate(by_s)}
    rb = {i + 1: p + 1 for p, i in enumerate(by_v)}
    disc = sum(
        1
        for a in range(1, n + 1)
        for b in range(a + 1, n + 1)
        if (rb[b] - rb[a]) * (ra[b] - ra[a]) < 0
    )
    assert got["n_pairs"] == n * (n - 1) // 2
    assert got["discordant"] == disc


@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture]
)
@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=300), st.booleans()),
        min_size=2,
        max_size=20,
    )
)
def test_distribution_distances_match_naive(spark, tmp_path, items):
    """ECDF-gap Wasserstein and prefix-identity energy distance equal
    brute-force O(n^2) computations."""
    import datetime as _dt

    from prosnet_prefect_pipelines_spark.plans.q_pipeline110 import (
        q_energy_distance_returns,
        q_wasserstein1_returns,
    )

    xs = [c for c, y in items if y]
    ys = [c for c, y in items if not y]
    assume(xs and ys)
    orows = [
        (i, 1, "O", c / 100.0, _dt.datetime(1996, 3, 1), "3-MEDIUM")
        for i, (c, _) in enumerate(items, start=1)
    ]
    lrows = [
        (i, 0.0, "R" if y else "N") for i, (_, y) in enumerate(items, start=1)
    ]
    spark.createDataFrame(
        orows,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        lrows, "l_orderkey long, l_discount double, l_returnflag string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")

    n1, n2 = len(xs), len(ys)
    # naive W1: integrate |F1 - F2| over the pooled grid
    grid = sorted(set(xs) | set(ys))
    w1 = 0
    for a, b in zip(grid, grid[1:]):
        cc1 = sum(1 for v in xs if v <= a)
        cc2 = sum(1 for v in ys if v <= a)
        w1 += abs(cc1 * n2 - cc2 * n1) * (b - a)
    got_w = q_wasserstein1_returns(spark, str(tmp_path)).collect()[0]
    assert (got_w["n_returned"], got_w["n_kept"]) == (n1, n2)
    assert abs(got_w["wasserstein1_dollars_6"] - _round6(w1 / (n1 * n2) / 100.0)) <= 1e-9

    sxy = sum(abs(a - b) for a in xs for b in ys)
    sxx = sum(abs(a - b) for i, a in enumerate(xs) for b in xs[i + 1:])
    syy = sum(abs(a - b) for i, a in enumerate(ys) for b in ys[i + 1:])
    e = 2 * sxy / (n1 * n2) - 2 * sxx / (n1 * n1) - 2 * syy / (n2 * n2)
    got_e = q_energy_distance_returns(spark, str(tmp_path)).collect()[0]
    assert abs(got_e["energy_distance_dollars_6"] - _round6(e / 100.0)) <= 1e-9
