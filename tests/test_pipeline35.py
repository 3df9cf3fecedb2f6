"""Unit tests for batch-35: training-order shuffle, multimodal
interleaving."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_shuffle_is_permutation_per_epoch(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline35 import (
        _EPOCHS,
        _SHARDS,
        q_training_order_shuffle,
    )

    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    rows = q_training_order_shuffle(spark, SF).collect()
    assert len(rows) == n_docs * _EPOCHS
    by_epoch: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.shard < _SHARDS
        by_epoch.setdefault(r.epoch, []).append(r)
    orders = {}
    for epoch, rs in by_epoch.items():
        assert len(rs) == n_docs
        # positions within a shard are dense 1..k
        per_shard: dict[int, set] = {}
        for r in rs:
            per_shard.setdefault(r.shard, set()).add(r.pos)
        for shard, poss in per_shard.items():
            assert poss == set(range(1, len(poss) + 1))
        orders[epoch] = [
            r.doc_id for r in sorted(rs, key=lambda x: (x.shard, x.pos))
        ]
    # different epochs give different permutations of the same docs
    assert sorted(orders[1]) == sorted(orders[2])
    assert orders[1] != orders[2]


def test_interleave_structure(spark):
    from prosnet_prefect_pipelines_spark.plans.q_pipeline35 import (
        _IMGS,
        q_interleaved_multimodal_seq,
    )

    docs = {
        r.doc_id: r.text.strip().split()
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    by_doc: dict[int, list] = {}
    for r in q_interleaved_multimodal_seq(spark, SF).collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.seq_pos)
        # dense positions from 0
        assert [r.seq_pos for r in rs] == list(range(len(rs)))
        texts = [r for r in rs if r.modality == "text"]
        images = [r for r in rs if r.modality == "image"]
        assert len(images) == _IMGS
        # text chunks reassemble to the document in order
        reassembled = " ".join(r.content for r in texts).split()
        assert reassembled == docs[doc_id]
        # an image row never precedes the first text chunk (it is always
        # inserted after its matched chunk)
        assert rs[0].modality == "text"
