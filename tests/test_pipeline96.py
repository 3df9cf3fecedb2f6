"""Unit tests for batch-96: rank & ordinal statistics.

Known-value checks: Mann–Whitney U on a hand-ranked 3v4 sample,
Kruskal–Wallis against an independent sort-based ranking
implementation, Spearman ±1 on perfect (anti)monotone data, gamma /
Somers' D / tau-b on hand-counted 2x2 cells, Brown–Forsythe against a
direct median-deviation ANOVA recomputation.
"""

from __future__ import annotations

import datetime as dt

import pytest


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_orders(spark, path, rows):
    spark.createDataFrame(
        rows,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")


def _events_from_groups(groups: dict[str, list[float]]):
    rows, eid = [], 0
    for g, vals in sorted(groups.items()):
        for v in vals:
            eid += 1
            rows.append((eid, dt.datetime(2021, 3, 1, 0, eid % 60, eid % 60),
                         eid, g, float(v), "{}"))
    return rows


def _avg_ranks(values):
    """Independent implementation: sort-based average ranks."""
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


def test_mann_whitney_hand_ranked(spark, tmp_path):
    """click=[1,2,4] view=[3,5,6,7]: R1=7, U1=1 -> u1_x2=2."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline96 import q_mann_whitney_u

    _write_events(
        spark, tmp_path,
        _events_from_groups({"click": [1, 2, 4], "view": [3, 5, 6, 7]}),
    )
    r = q_mann_whitney_u(spark, str(tmp_path)).collect()[0]
    assert (r.n1, r.n2) == (3, 4)
    assert r.u1_x2 == 2
    # no ties: z = (1 - 6) / sqrt(3*4*8/12) = -5/sqrt(8)
    assert r.z == pytest.approx(-5 / 8 ** 0.5, abs=1e-6)


def test_kruskal_wallis_matches_independent_ranking(spark, tmp_path):
    groups = {
        "click": [2.9, 3.0, 2.5, 2.6, 3.2],
        "view": [3.8, 2.7, 4.0, 2.4],
        "error": [2.8, 3.4, 3.7, 2.2, 2.0, 2.5, 3.0],  # ties with click
    }
    from prosnet_prefect_pipelines_spark.plans.q_pipeline96 import q_kruskal_wallis_h

    _write_events(spark, tmp_path, _events_from_groups(groups))
    r = q_kruskal_wallis_h(spark, str(tmp_path)).collect()[0]

    flat, labels = [], []
    for g, vals in groups.items():
        flat += vals
        labels += [g] * len(vals)
    ranks = _avg_ranks(flat)
    n = len(flat)
    by_g: dict[str, list[float]] = {}
    for lab, rk in zip(labels, ranks):
        by_g.setdefault(lab, []).append(rk)
    h = 12 / (n * (n + 1)) * sum(
        sum(rs) ** 2 / len(rs) for rs in by_g.values()
    ) - 3 * (n + 1)
    from collections import Counter

    tie = sum(t ** 3 - t for t in Counter(flat).values())
    corr = 1 - tie / (n ** 3 - n)
    assert r.k == 3 and r.n == n
    assert r.tie_weight == tie
    assert r.h_uncorrected == pytest.approx(h, abs=1e-6)
    assert r.h == pytest.approx(h / corr, abs=1e-6)


def test_spearman_perfect_monotone(spark, tmp_path):
    """Within one priority bucket price increases with date -> rho=1;
    within another it decreases -> rho=-1."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline96 import (
        q_spearman_rho_price_recency,
    )

    rows = []
    for i in range(6):
        rows.append((i, i, "O", 100.0 + 50 * i,
                     dt.datetime(1993, 1 + i, 10), "1-URGENT"))
        rows.append((100 + i, i, "O", 900.0 - 50 * i,
                     dt.datetime(1993, 1 + i, 10), "2-HIGH"))
    _write_orders(spark, tmp_path, rows)
    out = {r.g: r for r in q_spearman_rho_price_recency(spark, str(tmp_path)).collect()}
    assert out["1-URGENT"].rho == pytest.approx(1.0, abs=1e-6)
    assert out["2-HIGH"].rho == pytest.approx(-1.0, abs=1e-6)


def test_gamma_somers_taub_hand_counted(spark, tmp_path):
    """Cells: (a=1,b=1):3, (a=1,b=2):1, (a=2,b=1):1, (a=2,b=2):2.
    C = 3*2 = 6, D = 1*1 = 1, Ty = 3*1 + 1*2 = 5, Tx = 3*1 + 1*2 = 5.
    gamma = 5/7; d_yx = 5/12. n=7, n0=21, n1 = C(4,2)+C(3,2)=9,
    n2 = 9 -> tau_b = 5/12."""
    from prosnet_prefect_pipelines_spark.plans.q_pipeline96 import (
        q_kendall_tau_b,
        q_ordinal_gamma_somers,
    )

    cells = [(1, 1, 3), (1, 2, 1), (2, 1, 1), (2, 2, 2)]
    prio = {1: "1-URGENT", 2: "2-HIGH"}
    month = {1: 2, 2: 5}  # quarter 1 and 2
    rows, key = [], 0
    for a, b, n in cells:
        for _ in range(n):
            key += 1
            rows.append((key, key, "O", 10.0,
                         dt.datetime(1994, month[b], 3), prio[a]))
    _write_orders(spark, tmp_path, rows)
    g = q_ordinal_gamma_somers(spark, str(tmp_path)).collect()[0]
    assert (g.concordant, g.discordant) == (6, 1)
    assert (g.tied_x_only, g.tied_y_only) == (5, 5)
    assert g.gamma == pytest.approx(5 / 7, abs=1e-6)
    assert g.somers_d_yx == pytest.approx(5 / 12, abs=1e-6)
    t = q_kendall_tau_b(spark, str(tmp_path)).collect()[0]
    assert t.n == 7 and (t.concordant, t.discordant) == (6, 1)
    assert t.tau_b == pytest.approx(5 / 12, abs=1e-6)


def test_brown_forsythe_direct_recompute(spark, tmp_path):
    groups = {
        "click": [1.0, 2.0, 3.0, 9.0],
        "view": [4.0, 4.1, 4.2, 4.3, 4.4],
        "error": [0.0, 5.0, 10.0],
    }
    from prosnet_prefect_pipelines_spark.plans.q_pipeline96 import q_brown_forsythe_f

    _write_events(spark, tmp_path, _events_from_groups(groups))
    r = q_brown_forsythe_f(spark, str(tmp_path)).collect()[0]

    # nearest-rank-lower median, micro-integer exact
    zs, labels = [], []
    for g, vals in groups.items():
        v6 = sorted(round(v * 1_000_000) for v in vals)
        med = v6[(len(v6) + 1) // 2 - 1]
        for x in v6:
            zs.append(abs(x - med))
            labels.append(g)
    n, k = len(zs), len(groups)
    by_g: dict[str, list[int]] = {}
    for lab, z in zip(labels, zs):
        by_g.setdefault(lab, []).append(z)
    grand = sum(zs) / n
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in by_g.values())
    ssw = sum(
        (z - sum(v) / len(v)) ** 2 for v in by_g.values() for z in v
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r.k == k and r.n == n
    assert r.f_stat == pytest.approx(f, rel=1e-6)
