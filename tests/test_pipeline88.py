"""Unit tests for batch-88: prefix structures & growth curves."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_autocomplete_prefix_consistency(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline88 import (
        q_autocomplete_prefix_table,
    )

    rows = q_autocomplete_prefix_table(spark, SF).collect()
    assert rows
    per_prefix = {}
    for r in rows:
        assert r.completion.startswith(r.prefix)
        per_prefix.setdefault(r.prefix, []).append(r)
    for prefix, rs in per_prefix.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        freqs = [r.freq for r in rs]
        assert freqs == sorted(freqs, reverse=True)


def test_lpm_covers_all_parts_and_prefers_longest(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline88 import (
        q_longest_prefix_match,
    )

    rows = q_longest_prefix_match(spark, SF).collect()
    n_parts = spark.read.parquet(f"{SF}/part.parquet").count()
    assert sum(r.n_keys for r in rows) == n_parts
    # 3-char routes (route id >= 200) must capture keys (every even part
    # key contributes a 3-char route that matches itself)
    assert any(r.route >= 200 for r in rows)


def test_growth_curve_totals(spark):
    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline88 import (
        q_user_growth_curve,
    )

    rows = sorted(q_user_growth_curve(spark, SF).collect(), key=lambda r: r.day)
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .count()
    )
    cum = 0
    for r in rows:
        cum += r.new_users
        assert r.cumulative_users == cum
    assert cum == n_users


def test_power_user_curve_monotone(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline88 import (
        q_power_user_curve,
    )

    rows = sorted(q_power_user_curve(spark, SF).collect(), key=lambda r: r.k)
    assert [r.k for r in rows] == list(range(1, 31))
    for a, b in zip(rows, rows[1:]):
        assert b.n_users_at_least_k <= a.n_users_at_least_k
    assert rows[0].share_ppm <= 1_000_000


def test_anagram_groups_contain_reversals(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline88 import (
        q_anagram_groups,
    )

    rows = q_anagram_groups(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_terms >= 2
        assert sorted(r.signature) == list(r.signature)  # canonical form
        assert sorted(r.first_term) == list(r.signature)
