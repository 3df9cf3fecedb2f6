"""Unit tests for batch-34: DSIR importance scores, epoch expansion."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_dsir_preaggregate_occurrence_exact(spark):
    """Pin the r11 (doc, lang, f, cnt) pre-aggregate to occurrence-level
    semantics: brute-force the whole DSIR estimator in Python one bigram
    occurrence at a time (no cnt weighting anywhere) and require the
    catalog query's (n_grams, score_micro) to match per document."""
    import hashlib
    import re
    from collections import Counter

    import pandas as pd

    from prosnet_prefect_pipelines_spark.plans.q_pipeline34 import (
        _B,
        q_dsir_importance_scores,
    )

    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "lang", "text"]
    )

    def h48(s: str) -> int:
        return int(hashlib.md5((s + "dsir").encode()).hexdigest()[:12], 16) % _B

    raw: Counter = Counter()
    tgt: Counter = Counter()
    per_doc: dict[tuple, list] = {}
    for doc_id, lang, text in docs.itertuples(index=False):
        # twin the ENGINE's tokenizer semantics exactly (ADVICE r11):
        # Spark trim strips ASCII space (0x20) only and Java \s is the
        # ASCII class [ \t\n\x0B\f\r] — Python str.strip()/re \s are
        # Unicode-aware and would diverge on exotic whitespace
        t = text.strip(" ")
        toks = re.split(r"[ \t\n\x0b\f\r]+", t) if t else []
        if len(toks) < 2:
            continue
        fs = [h48(f"{toks[i]} {toks[i+1]}") for i in range(len(toks) - 1)]
        per_doc[(doc_id, lang)] = fs
        raw.update(fs)
        if lang == "en":
            tgt.update(fs)
    traw = sum(raw.values())
    ttgt = sum(tgt.values())
    r_micro = {
        f: (tgt.get(f, 0) + 1) * (traw + _B) * 1_000_000
        // ((raw[f] + 1) * (ttgt + _B))
        for f in raw
    }
    expected = {
        k: (len(fs), sum(r_micro[f] for f in fs) // len(fs))
        for k, fs in per_doc.items()
    }
    got = {
        (r.doc_id, r.lang): (r.n_grams, r.score_micro)
        for r in q_dsir_importance_scores(spark, SF).collect()
    }
    assert got == expected


def test_dsir_scores_float_log_twin_agrees_on_ranking(spark):
    """The catalog query scores with exact-integer mean ratios; the
    published estimator uses mean log ratios. Both must broadly agree:
    rank correlation positive and the en (target) population must
    score above the non-en population under BOTH estimators."""
    import math

    from pyspark.sql import functions as F

    from prosnet_prefect_pipelines_spark.plans.q_pipeline34 import (
        _B,
        q_dsir_importance_scores,
    )
    from prosnet_prefect_pipelines_spark.plans.q_pipeline15 import _hash48

    rows = q_dsir_importance_scores(spark, SF).collect()
    assert rows
    en = [r.score_micro for r in rows if r.lang == "en"]
    rest = [r.score_micro for r in rows if r.lang != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)

    # float-log twin computed directly in local python on the same
    # hashed features
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    grams = (
        docs.select("doc_id", "lang", toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("toks"), i),
                        F.element_at(F.col("toks"), i + 1),
                    ),
                )
            ).alias("gram"),
        )
        .select("doc_id", "lang", (_hash48(F.col("gram"), "dsir") % _B).alias("f"))
        .collect()
    )
    craw: dict[int, int] = {}
    ctgt: dict[int, int] = {}
    per_doc: dict[int, list] = {}
    for r in grams:
        craw[r.f] = craw.get(r.f, 0) + 1
        if r.lang == "en":
            ctgt[r.f] = ctgt.get(r.f, 0) + 1
        per_doc.setdefault(r.doc_id, []).append(r.f)
    traw = sum(craw.values())
    ttgt = sum(ctgt.values())
    log_scores = {}
    for doc_id, fs in per_doc.items():
        s = sum(
            math.log(
                ((ctgt.get(f, 0) + 1) / (ttgt + _B)) / ((craw[f] + 1) / (traw + _B))
            )
            for f in fs
        )
        log_scores[doc_id] = s / len(fs)
    en_l = [log_scores[r.doc_id] for r in rows if r.lang == "en"]
    rest_l = [log_scores[r.doc_id] for r in rows if r.lang != "en"]
    assert sum(en_l) / len(en_l) > sum(rest_l) / len(rest_l)

    # crude rank agreement: top-quartile sets by each estimator overlap
    by_int = sorted(rows, key=lambda r: -r.score_micro)
    by_log = sorted(rows, key=lambda r: -log_scores[r.doc_id])
    k = len(rows) // 4
    top_int = {r.doc_id for r in by_int[:k]}
    top_log = {r.doc_id for r in by_log[:k]}
    assert len(top_int & top_log) >= k // 2


def test_epoch_expansion_invariants(spark):
    from collections import Counter

    from prosnet_prefect_pipelines_spark.plans.q_pipeline34 import (
        _MAX_EPOCHS,
        q_epoch_expansion,
    )

    rows = q_epoch_expansion(spark, SF).collect()
    assert rows
    per_doc = Counter(r.doc_id for r in rows)
    for r in rows:
        assert 1 <= r.epoch <= r.repeats <= _MAX_EPOCHS
        assert per_doc[r.doc_id] == r.repeats  # fully materialized
    # repetition narrows the post-expansion source imbalance vs raw
    src_before = Counter()
    src_after = Counter()
    for r in rows:
        src_after[r.source] += 1
        if r.epoch == 1:
            src_before[r.source] += 1
    def spread(c):
        return max(c.values()) / min(c.values())
    assert spread(src_after) <= spread(src_before) + 1e-9
