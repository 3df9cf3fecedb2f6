"""Pipeline batch 117: STREAMING preference-data monitoring — the
batch-116 post-training tier's streaming twin, completing the
batch->streaming symmetry the engine maintains for every other tier
(dedup 113, resolution 114, ANN serving 115).

Production shape: scored candidate completions arrive continuously; the
monitor maintains, per prompt group (lang, source), the group's full
candidate roster as streaming state — bounded by the GENERATION FAN-OUT
(10-16 completions per prompt), never by corpus size, so state is the
one sufficient statistic from which every batch-116 closed form is
recomputable exactly. Each micro-batch, groups that received new
candidates re-derive their pair stats (chosen = top reward, hardest
negatives, margin floor + cap — the identical ordering rules as
q_pipeline116) and emit a refreshed stats row tagged with a per-group
monotone ``seq``; the sink keeps last-write-wins per group (the K2
upsert discipline, batch-106 pattern). After an availableNow replay the
final sink rows hash-match the batch DuckDB oracles bit-for-bit:

- ``stream_preference_margin_monitor`` == ``preference_margin_report``
  (per-group pair count + exact integer margin mass);
- ``stream_length_bias_monitor`` == ``length_bias_audit`` (global
  reward-hacking screen, recomputed from the same final rows — the
  fraction is derived from two exact integer sums, so the one double
  rounds identically in both engines).

Replay-slicing insensitivity: the emitted stats are a pure function of
the group's accumulated candidate SET (arrival order never enters —
candidates are deduped by doc_id and re-sorted inside the closed form),
and last-write-wins keeps only each group's final roster's stats, so
ANY micro-batch slicing yields the batch answer.

Scale notes (100 TB): state per group = fan-out-bounded arrays; group
count = prompt-dimension cardinality; per-batch work = the closed form
over changed groups only. No window over the corpus anywhere.
Reference parity: no reference counterpart (extension family
X-PREF-STREAM; COVERAGE.md north star).
"""

from __future__ import annotations

import tempfile

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.window import Window

from prosnet_prefect_pipelines_spark.plans.catalog import register
from prosnet_prefect_pipelines_spark.plans.q_pipeline116 import (
    _MAX_REJECTED,
    _MIN_MARGIN,
    LENGTH_BIAS_SQL,
    MARGIN_REPORT_SQL,
)
from prosnet_prefect_pipelines_spark.operators.textstats import tokens
from prosnet_prefect_pipelines_spark.streaming.staging import replay_stage

_OUT_SCHEMA = (
    "lang string, source string, n_pairs long, min_margin long, "
    "max_margin long, sum_margin long, n_chosen_longer long, "
    "sum_len_delta long, seq long"
)
_STATE_SCHEMA = (
    "ids array<long>, rewards array<long>, lens array<long>, seq long"
)


def _group_stats(key, pdfs, state):
    """Per-(lang, source) stateful emitter: fold new candidates into the
    roster, recompute the batch-116 closed form, emit one refreshed
    stats row (only when the roster changed). All-integer arithmetic;
    chosen/negative ordering identical to q_pipeline116."""
    lang, source = key
    if state.exists:
        ids0, rewards0, lens0, seq = state.get
        ids, rewards, lens = list(ids0), list(rewards0), list(lens0)
    else:
        ids, rewards, lens, seq = [], [], [], 0
    seen = set(ids)
    changed = False
    for pdf in pdfs:
        for did, rw, ln in zip(pdf["doc_id"], pdf["reward"], pdf["n_chars"]):
            did = int(did)
            if did in seen:
                continue  # idempotent under re-delivery
            seen.add(did)
            ids.append(did)
            rewards.append(int(rw))
            lens.append(int(ln))
            changed = True
    if not changed:
        yield pd.DataFrame(
            {c: pd.Series([], dtype="object") for c in
             ["lang", "source"]} |
            {c: pd.Series([], dtype="int64") for c in
             ["n_pairs", "min_margin", "max_margin", "sum_margin",
              "n_chosen_longer", "sum_len_delta", "seq"]}
        )
        return
    seq += 1
    state.update((ids, rewards, lens, seq))

    roster = pd.DataFrame({"doc_id": ids, "reward": rewards, "n_chars": lens})
    roster = roster.sort_values(
        ["reward", "doc_id"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    ch_reward = int(roster.loc[0, "reward"])
    ch_len = int(roster.loc[0, "n_chars"])
    neg = roster.iloc[1:].assign(margin=lambda d: ch_reward - d["reward"])
    neg = neg[neg["margin"] >= _MIN_MARGIN]
    neg = neg.sort_values(
        ["margin", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(_MAX_REJECTED)
    yield pd.DataFrame(
        {
            "lang": [lang],
            "source": [source],
            "n_pairs": [len(neg)],
            "min_margin": [int(neg["margin"].min()) if len(neg) else 0],
            "max_margin": [int(neg["margin"].max()) if len(neg) else 0],
            "sum_margin": [int(neg["margin"].sum()) if len(neg) else 0],
            "n_chosen_longer": [int((neg["n_chars"] < ch_len).sum())],
            "sum_len_delta": [int((ch_len - neg["n_chars"]).sum())],
            "seq": [seq],
        }
    )


def _final_group_stats(spark, sf_dir):
    """Run the availableNow replay (4 staged micro-batches of the
    documents table) and return the LAST stats row per prompt group."""
    path = f"{sf_dir}/documents.parquet"
    docs = spark.read.parquet(path).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    stage = replay_stage(docs, path, "prefdocs")
    schema = spark.read.parquet(stage).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    scored = src.select(
        "lang",
        "source",
        "doc_id",
        (
            F.lit(1000) * F.size(F.array_distinct(tokens(F.col("text"))))
            - F.col("n_chars")
        ).cast("long").alias("reward"),
        "n_chars",
    )
    out_dir = tempfile.mkdtemp(prefix="pref_monitor_")
    q = (
        scored.groupBy("lang", "source")
        .applyInPandasWithState(
            _group_stats,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .writeStream.foreachBatch(
            lambda b, _i: b.write.mode("append").parquet(out_dir)
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError("stream preference monitor replay timed out (300 s)")
    sink = spark.read.schema(_OUT_SCHEMA).parquet(out_dir)
    w = Window.partitionBy("lang", "source").orderBy(F.col("seq").desc())
    return (
        sink.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


@register("stream_preference_margin_monitor", oracle=MARGIN_REPORT_SQL,
          covers=["T1", "T2", "A2", "A1"])
def q_stream_preference_margin_monitor(spark, sf_dir):
    """Streaming per-group margin-mass telemetry: fan-out-bounded
    roster state + per-batch closed-form refresh, last-write-wins sink;
    availableNow replay hash-matches the batch preference_margin_report
    for any slicing."""
    final = _final_group_stats(spark, sf_dir)
    return final.filter(F.col("n_pairs") > 0).select(
        "lang", "source", "n_pairs", "min_margin", "max_margin", "sum_margin"
    )


@register("stream_length_bias_monitor", oracle=LENGTH_BIAS_SQL,
          covers=["T1", "T2", "A2"])
def q_stream_length_bias_monitor(spark, sf_dir):
    """Streaming reward-hacking screen: the global length-bias audit
    derived from the same final per-group rows — two exact integer sums
    plus one identically-rounded fraction, hash-matching the batch
    length_bias_audit."""
    final = _final_group_stats(spark, sf_dir).filter(F.col("n_pairs") > 0)
    return final.agg(
        F.sum("n_pairs").cast("long").alias("n_pairs"),
        F.sum("n_chosen_longer").cast("long").alias("n_chosen_longer"),
        F.round(
            F.sum("n_chosen_longer") / (F.lit(1.0) * F.sum("n_pairs")), 6
        ).alias("frac_chosen_longer"),
        F.sum("sum_len_delta").cast("long").alias("sum_len_delta"),
    )

