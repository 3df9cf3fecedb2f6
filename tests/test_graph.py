"""Unit tests for closure / components on shapes the oracle data lacks:
cycles, diamonds, isolated chains (FIXTURES.md A1 content requirements)."""

from __future__ import annotations

import pytest

from prosnet_prefect_pipelines_spark.operators.graph import (
    connected_components,
    transitive_closure,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_closure_diamond(spark):
    # a -> b, a -> c, b -> d, c -> d (diamond): a reaches d once
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")])
    got = {(r.src, r.dst) for r in transitive_closure(e).collect()}
    assert got == {
        ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("a", "d"),
    }


def test_closure_cycle_terminates(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    got = {(r.src, r.dst) for r in transitive_closure(e).collect()}
    # every node reaches every node (incl. itself via the cycle)
    assert got == {(x, y) for x in "abc" for y in "abc"}


def test_closure_reflexive_zero_length(spark):
    e = _edges(spark, [("a", "b")])
    got = {(r.src, r.dst) for r in transitive_closure(e, reflexive=True).collect()}
    assert got == {("a", "b"), ("a", "a"), ("b", "b")}


def test_closure_reflexive_cycle_no_duplicates(spark):
    """Cycles put (x, x) in the closure already; reflexive=True must not
    emit the zero-length path a second time (bag semantics)."""
    e = _edges(spark, [("a", "b"), ("b", "a"), ("b", "c")])
    for kwargs in ({}, {"driver_threshold": 0}):
        rows = [
            (r.src, r.dst)
            for r in transitive_closure(e, reflexive=True, **kwargs).collect()
        ]
        assert len(rows) == len(set(rows)), f"duplicate rows via {kwargs or 'driver'}"
        assert set(rows) == {
            ("a", "a"), ("a", "b"), ("a", "c"),
            ("b", "a"), ("b", "b"), ("b", "c"),
            ("c", "c"),
        }


def test_closure_max_iterations(spark):
    # the iteration cap only applies to the distributed fixpoint
    # (the driver BFS path terminates on any graph)
    e = _edges(spark, [(f"n{i}", f"n{i+1}") for i in range(6)])
    with pytest.raises(RuntimeError):
        transitive_closure(e, max_iterations=2, driver_threshold=0)


def test_closure_driver_vs_distributed_equivalence(spark):
    import random

    rng = random.Random(11)
    pairs = list({(f"v{rng.randrange(30)}", f"v{rng.randrange(30)}") for _ in range(50)})
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges(spark, pairs)
    via_driver = {(r.src, r.dst) for r in transitive_closure(e, reflexive=True).collect()}
    via_fixpoint = {
        (r.src, r.dst)
        for r in transitive_closure(e, reflexive=True, driver_threshold=0).collect()
    }
    via_doubling = {
        (r.src, r.dst)
        for r in transitive_closure(
            e, reflexive=True, driver_threshold=0, method="doubling"
        ).collect()
    }
    assert via_driver == via_fixpoint == via_doubling


def test_descendants_driver_vs_distributed_equivalence(spark):
    from prosnet_prefect_pipelines_spark.operators.graph import descendants

    # child -> parent tree with a side branch not under the root
    e = _edges(
        spark,
        [("b", "a"), ("c", "a"), ("d", "b"), ("e", "b"), ("f", "c"),
         ("x", "y"), ("y", "z")],
    )
    for reflexive in (True, False):
        via_driver = {r.node for r in descendants(e, ["a"], reflexive=reflexive).collect()}
        via_dist = {
            r.node
            for r in descendants(
                e, ["a"], reflexive=reflexive, driver_threshold=0
            ).collect()
        }
        assert via_driver == via_dist
        assert ("a" in via_driver) == reflexive
        assert "x" not in via_driver


def test_components_chain_cycle_and_separate(spark):
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"),          # chain
         ("x", "y"), ("y", "z"), ("z", "x"),  # cycle
         ("q", "r")],                      # pair
    )
    got = {(r.node, r.comp) for r in connected_components(e).collect()}
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"),
        ("x", "x"), ("y", "x"), ("z", "x"),
        ("q", "q"), ("r", "q"),
    }


def test_components_long_chain_star_contraction(spark):
    # 40-node chain: min-label propagation needs 40 rounds; large/small-star
    # contraction must converge well under the 50-iteration cap
    # (driver_threshold=0 forces the distributed path)
    e = _edges(spark, [(f"n{i:02d}", f"n{i+1:02d}") for i in range(39)])
    rows = connected_components(e, max_iterations=12, driver_threshold=0).collect()
    assert {r.comp for r in rows} == {"n00"}
    assert len(rows) == 40


def test_components_driver_vs_distributed_equivalence(spark):
    # both physical strategies must label identically on an irregular
    # graph: chains, a cycle, a diamond-merge, singleton-free pairs
    import random

    rng = random.Random(7)
    pairs = [(f"v{rng.randrange(60):02d}", f"v{rng.randrange(60):02d}") for _ in range(80)]
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges(spark, pairs)
    via_driver = {(r.node, r.comp) for r in connected_components(e).collect()}
    via_stars = {
        (r.node, r.comp)
        for r in connected_components(e, driver_threshold=0).collect()
    }
    assert via_driver == via_stars


def test_fixpoints_with_reliable_checkpoint_dir(spark, tmp_path):
    """With a checkpoint dir configured, the distributed fixpoints use
    reliable checkpoints (cluster fault tolerance) and still produce the
    same results."""
    sc = spark.sparkContext
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        e = _edges(spark, [(f"n{i:02d}", f"n{i+1:02d}") for i in range(12)])
        comps = connected_components(e, driver_threshold=0).collect()
        assert {r.comp for r in comps} == {"n00"} and len(comps) == 13
        clo = transitive_closure(e, driver_threshold=0).collect()
        assert len(clo) == 12 * 13 // 2
    finally:
        sc._jsc.sc().setCheckpointDir(None)  # unset for other tests
