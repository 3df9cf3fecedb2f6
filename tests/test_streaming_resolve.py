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


def _run_sliced(spark, edges, batches_idx, driver_threshold=None):
    kwargs = {} if driver_threshold is None else {
        "driver_threshold": driver_threshold
    }
    r = IncrementalResolver(spark, **kwargs)
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


def test_driver_and_distributed_paths_agree(spark):
    """The adaptive state placement must be invisible: the driver
    union-find fast path (default), an immediate spill to the
    distributed path (threshold 0), and a MID-STREAM spill (threshold
    hit between batches) all produce identical min-member labels."""
    rng = random.Random(1140)
    for trial in range(4):
        n_nodes = rng.randint(6, 20)
        edges = [
            (f"n{rng.randint(0, n_nodes)}", f"n{rng.randint(0, n_nodes)}")
            for _ in range(rng.randint(5, 25))
        ]
        edges = [e for e in edges if e[0] != e[1]]
        want = _uf_components(edges)
        cuts = sorted(rng.randint(0, len(edges)) for _ in range(2))
        bounds = list(zip([0] + cuts, cuts + [len(edges)]))
        for thr in (None, 0, 4):
            got = _run_sliced(spark, edges, bounds, driver_threshold=thr)
            assert got == want, f"trial {trial} threshold {thr}: {got} != {want}"


def test_spill_happens_and_distributed_continues(spark):
    """Crossing driver_threshold promotes the state exactly once; later
    batches run the distributed contraction path and stay correct."""
    r = IncrementalResolver(spark, driver_threshold=3)

    def upd(rows):
        r.update(spark.createDataFrame(rows, "src string, dst string"))

    upd([("a", "b")])            # 2 nodes: stays on driver
    assert r._driver
    upd([("c", "d"), ("d", "e")])  # 5 nodes: spills
    assert not r._driver and r._parent == {}
    upd([("b", "c")])            # distributed merge across the spill
    got = {row.node: row.comp for row in r.mapping().collect()}
    assert got == {n: "a" for n in "abcde"}


def test_restore_small_resumes_on_driver_path(spark, tmp_path):
    src = IncrementalResolver(spark, driver_threshold=0)  # distributed
    src.update(spark.createDataFrame([("b", "c"), ("x", "y")],
                                     "src string, dst string"))
    path = str(tmp_path / "mapping")
    src.save(path)

    r = IncrementalResolver.restore(spark, path)
    assert r._driver  # 4 saved nodes <= default threshold
    r.update(spark.createDataFrame([("a", "b"), ("c", "x")],
                                   "src string, dst string"))
    got = {row.node: row.comp for row in r.mapping().collect()}
    assert got == {n: "a" for n in "abcxy"}
