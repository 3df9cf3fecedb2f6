"""Streaming entity resolution (streaming/resolve.py, batch 114).

The load-bearing claim: IncrementalResolver.mapping() equals
connected_components(all edges so far) after ANY slicing of the edge
stream into micro-batches — min-label merging is confluent. Verified
against a pure-Python union-find oracle over random graphs and random
slicings, plus chain-merge edge cases (a batch whose edges bridge two
previously separate components, including through NEW nodes).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.streaming.resolve import IncrementalResolver


def _uf_components(edges: list[tuple[str, str]]) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    # min-member label per component
    members: dict[str, list[str]] = {}
    for n in parent:
        members.setdefault(find(n), []).append(n)
    out = {}
    for mem in members.values():
        lbl = min(mem)
        for n in mem:
            out[n] = lbl
    return out


def _run_sliced(spark, edges, batches_idx):
    r = IncrementalResolver(spark)
    for lo, hi in batches_idx:
        batch = edges[lo:hi]
        df = spark.createDataFrame(
            batch or [("__none__", "__none__")], "src string, dst string"
        )
        if not batch:
            df = df.where(F.lit(False))
        r.update(df)
    return {row.node: row.comp for row in r.mapping().collect()}


def test_incremental_equals_batch_on_random_slicings(spark):
    rng = random.Random(114)
    for trial in range(6):
        n_nodes = rng.randint(4, 24)
        n_edges = rng.randint(3, 30)
        edges = [
            (f"n{rng.randint(0, n_nodes)}", f"n{rng.randint(0, n_nodes)}")
            for _ in range(n_edges)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        want = _uf_components(edges)

        rng.shuffle(edges)
        n_batches = rng.randint(1, 4)
        cuts = sorted(rng.randint(0, len(edges)) for _ in range(n_batches - 1))
        bounds = list(zip([0] + cuts, cuts + [len(edges)]))
        got = _run_sliced(spark, edges, bounds)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_late_bridge_merges_components(spark):
    """Two components built in separate batches, then one late edge
    (through a brand-new node) bridges them — the relabel step must
    rewrite BOTH sides to the global min label."""
    r = IncrementalResolver(spark)

    def upd(rows):
        r.update(spark.createDataFrame(rows, "src string, dst string"))

    upd([("b", "c"), ("c", "d")])          # comp min 'b'
    upd([("x", "y"), ("y", "z")])          # comp min 'x'
    got = {row.node: row.comp for row in r.mapping().collect()}
    assert got == {"b": "b", "c": "b", "d": "b", "x": "x", "y": "x", "z": "x"}

    upd([("d", "new1"), ("new1", "a"), ("a", "x")])  # bridge via new nodes
    got = {row.node: row.comp for row in r.mapping().collect()}
    assert set(got.values()) == {"a"}
    assert set(got) == {"a", "b", "c", "d", "new1", "x", "y", "z"}


def test_duplicate_and_redundant_edges_are_noops(spark):
    r = IncrementalResolver(spark)

    def upd(rows):
        r.update(spark.createDataFrame(rows, "src string, dst string"))

    upd([("a", "b")])
    before = sorted(r.mapping().collect())
    upd([("a", "b"), ("b", "a"), ("a", "a")])  # dup, reversed, self-loop
    after = sorted(r.mapping().collect())
    assert before == after


def test_mapping_empty_before_any_batch(spark):
    r = IncrementalResolver(spark)
    assert r.mapping().count() == 0
