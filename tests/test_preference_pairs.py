"""Preference-pair construction (plans/q_pipeline116.py, batch 116).

Pins the mining semantics on hand-built candidate groups: the chosen
completion is the per-group reward max (doc_id tie-break), ties and
sub-threshold margins produce NO pair, the per-group cap keeps the
largest margins, and the length-bias audit counts exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.plans import q_pipeline116 as P


def _docs(spark, rows):
    # (doc_id, text, lang, source, n_chars) with n_chars = len(text)
    return spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _write(df, tmp_path, name="documents.parquet"):
    out = str(tmp_path / name)
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_chosen_is_group_max_and_ties_make_no_pair(spark, tmp_path):
    # g1: "a b c" (3 distinct, reward 3000-5=2995) beats "a a a"
    # (1 distinct, reward 1000-5=995): margin 2000 -> one pair.
    # g2: two IDENTICAL texts -> margin 0 < threshold -> no pairs.
    docs = _docs(spark, [
        (1, "a b c", "en", "g1"),
        (2, "a a a", "en", "g1"),
        (3, "x y z", "en", "g2"),
        (4, "x y z", "en", "g2"),
    ])
    sf = _write(docs, tmp_path)
    pairs = P.q_dpo_pair_construction(spark, sf).collect()
    assert [(r.source, r.chosen_id, r.rejected_id, r.margin) for r in pairs] == [
        ("g1", 1, 2, 2000)
    ]


def test_cap_keeps_largest_margins(spark, tmp_path):
    # one group: 1 chosen + 12 rejected candidates with strictly
    # increasing margins; the cap must keep the _MAX_REJECTED largest
    texts = [(0, "t" + " ".join(f"w{i}" for i in range(20)), "en", "g")]
    for j in range(12):
        # j+1 distinct tokens, padded so rewards descend with j
        body = " ".join(f"w{i}" for i in range(j + 1)) + " w0" * (12 - j)
        texts.append((j + 1, body, "en", "g"))
    sf = _write(_docs(spark, texts), tmp_path)
    got = P.q_dpo_pair_construction(spark, sf).collect()
    assert len(got) == P._MAX_REJECTED
    kept = sorted((r.margin for r in got), reverse=True)
    assert all(m >= P._MIN_MARGIN for m in kept)
    # the kept set must be exactly the _MAX_REJECTED largest margins of
    # the full above-threshold candidate list
    scored = {r.doc_id: r.reward for r in P._scored(spark, sf).collect()}
    chosen_reward = max(scored.values())
    all_margins = sorted(
        (chosen_reward - v for v in scored.values()
         if chosen_reward - v >= P._MIN_MARGIN),
        reverse=True,
    )
    assert kept == all_margins[: P._MAX_REJECTED]


def test_margin_report_and_length_bias_exact(spark, tmp_path):
    docs = _docs(spark, [
        (1, "a b c d e f g h", "en", "g1"),   # chosen (8 distinct)
        (2, "a a", "en", "g1"),               # short rejected
        (3, "a a a a a a a a a a a a", "en", "g1"),  # long rejected
    ])
    sf = _write(docs, tmp_path)
    rep = {(r.lang, r.source): r for r in
           P.q_preference_margin_report(spark, sf).collect()}
    r = rep[("en", "g1")]
    pairs = P.q_dpo_pair_construction(spark, sf).collect()
    assert r.n_pairs == len(pairs) == 2
    assert r.min_margin == min(p.margin for p in pairs)
    assert r.max_margin == max(p.margin for p in pairs)
    assert r.sum_margin == sum(p.margin for p in pairs)

    bias = P.q_length_bias_audit(spark, sf).collect()[0]
    # chosen len 15; rejected lens 3 and 23 -> chosen longer once
    assert bias.n_pairs == 2
    assert bias.n_chosen_longer == 1
    assert bias.frac_chosen_longer == 0.5
    assert bias.sum_len_delta == (15 - 3) + (15 - 23)
