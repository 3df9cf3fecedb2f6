"""Iterative graph operators: transitive closure + connected components.

These are the two reference semantics Spark has no built-in for
(SURVEY §4 "custom work" items 1-2):

- ``wdt:P279*`` property paths (J5 — sparql/wikidata-city.sparql:6,
  wikidata-organization.sparql:5) -> ``transitive_closure``
- ``owl:sameAs`` entity-resolution clusters (J9 —
  pfp-prefect-pipelines/sparql/create_provided_entities_graph_v2.sparql:10-27)
  -> ``connected_components``

Both are driver-coordinated fixpoint loops of DataFrame joins.
Scale design:
- every iteration ``localCheckpoint``s the running result — without it the
  lineage (and thus task binaries + recovery cost) grows linearly with
  iterations, which kills long chains at 100 TB
- frontier-style expansion keeps the join input at |frontier| x |edges|,
  not |closure| x |edges|
- components use pointer-jumping (label(label) contraction) on top of
  neighbor propagation, giving O(log diameter) rounds instead of
  O(diameter)
- convergence checks are single scalar aggregations per round
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    reflexive: bool = False,
    max_iterations: int = 64,
    method: str = "frontier",
) -> DataFrame:
    """All (src, dst) pairs connected by 1+ edge hops; 0 hops if reflexive.

    SPARQL ``p*`` includes the zero-length path — the start node itself
    matches (SURVEY §2.3 J5 note) — so ``reflexive=True`` adds (x, x) for
    every node on either edge side.
    Raises after ``max_iterations`` (safety for unnoticed cycles; cycles
    themselves are handled — reached pairs are deduped away).

    method='frontier': one hop per round — O(diameter) rounds, minimal
    total work (each pair produced once). method='doubling': path
    doubling (reach ⋈ reach) — O(log diameter) rounds at the cost of
    re-deriving long paths from halves; wins when per-round scheduling
    latency dominates (deep chains, modest pair counts).
    """
    spark = edges.sparkSession
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
        e = e.localCheckpoint(eager=True)
        # small graphs: per-stage overhead dominates — drop the fixpoint's
        # shuffle parallelism; large graphs keep the session setting
        if e.count() < 50_000:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
        if method == "doubling":
            result = _closure_doubling(e, max_iterations)
        elif method == "frontier":
            result = _closure_frontier(e, max_iterations)
        else:
            raise ValueError(method)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    if reflexive:
        nodes = e.select(F.col("src").alias("n")).unionByName(
            e.select(F.col("dst").alias("n"))
        ).distinct()
        result = result.unionByName(nodes.select(F.col("n").alias("src"), F.col("n").alias("dst")))
    return result


def _closure_frontier(e: DataFrame, max_iterations: int) -> DataFrame:
    # reach = lazy union of MATERIALIZED frontier frames: each frontier
    # is checkpointed once, the union itself never is — no recompute
    # (every leaf is cached) and no per-iteration re-materialization of
    # the growing result
    frontiers = [e]
    frontier = e

    def reach():
        out = frontiers[0]
        for fr in frontiers[1:]:
            out = out.unionByName(fr)
        return out

    for _ in range(max_iterations):
        # one hop further from the current frontier only; the lazy
        # localCheckpoint materializes during the count() below — one
        # job per round, not two
        step = (
            frontier.alias("f")
            .join(e.alias("e"), F.col("f.dst") == F.col("e.src"))
            .select(F.col("f.src").alias("src"), F.col("e.dst").alias("dst"))
            .distinct()
        )
        frontier = step.join(reach(), on=["src", "dst"], how="left_anti").localCheckpoint(
            eager=False
        )
        if frontier.count() == 0:
            break
        frontiers.append(frontier)
    else:
        raise RuntimeError(
            f"transitive_closure: no fixpoint after {max_iterations} iterations"
        )
    return reach()


def _closure_doubling(e: DataFrame, max_iterations: int) -> DataFrame:
    # after k rounds reach covers all paths of length <= 2^k
    reach = e
    n = reach.count()
    for _ in range(max_iterations):
        step = (
            reach.alias("l")
            .join(reach.alias("r"), F.col("l.dst") == F.col("r.src"))
            .select(F.col("l.src").alias("src"), F.col("r.dst").alias("dst"))
        )
        merged = reach.unionByName(step).distinct().localCheckpoint(eager=False)
        m = merged.count()
        if m == n:
            return reach
        reach, n = merged, m
    raise RuntimeError(
        f"transitive_closure: no fixpoint after {max_iterations} iterations"
    )


def descendants(
    edges: DataFrame,
    roots: list[str],
    src: str = "src",
    dst: str = "dst",
    reflexive: bool = True,
    max_iterations: int = 64,
) -> DataFrame:
    """-> (node): everything that reaches any root via 1+ edges
    (plus the roots themselves when reflexive) — i.e. the subtree under
    the roots when edges point child -> parent.

    This is the right shape for ``?cls wdt:P279* <root>`` semi-joins
    (sparql/wikidata-city.sparql:6): single-source reachability does
    O(|subtree|) total work, where the filtered all-pairs closure the
    query naively implies does O(|V| * depth) — the difference between a
    bounded BFS and a quadratic blowup at 100 TB.
    """
    spark = edges.sparkSession
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
        e = e.localCheckpoint(eager=True)
        if e.count() < 50_000:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
        seed = spark.createDataFrame([(r,) for r in roots], "node string")
        reached = [seed.localCheckpoint(eager=True)]
        frontier = reached[0]

        def all_reached():
            out = reached[0]
            for fr in reached[1:]:
                out = out.unionByName(fr)
            return out

        for _ in range(max_iterations):
            step = (
                e.join(frontier, e["dst"] == frontier["node"])
                .select(F.col("src").alias("node"))
                .distinct()
            )
            frontier = step.join(all_reached(), on="node", how="left_anti").localCheckpoint(
                eager=False
            )
            if frontier.count() == 0:
                break
            reached.append(frontier)
        else:
            raise RuntimeError(
                f"descendants: no fixpoint after {max_iterations} iterations"
            )
        result = all_reached()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    if not reflexive:
        result = result.join(
            spark.createDataFrame([(r,) for r in roots], "node string"),
            on="node",
            how="left_anti",
        )
    return result


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """Undirected connected components -> (node, component) with the
    component labeled by its minimum member (lexicographic for strings).

    Min-label propagation + pointer jumping; deterministic output.
    """
    spark = edges.sparkSession
    # iterative frames are usually small relative to the source tables —
    # run the fixpoint at low parallelism to cut per-stage overhead, and
    # restore the session setting afterwards
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        sym = (
            edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if sym.count() < 100_000:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
        labels = (
            sym.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("comp", F.col("node"))
            .localCheckpoint(eager=True)
        )
        # convergence detector: order-independent fingerprint of the full
        # label assignment — one scalar aggregation, no compare join
        def fingerprint(df) -> int:
            # decimal accumulator: a long sum of 64-bit hashes overflows
            # under ANSI mode (Spark 4 default)
            row = df.agg(
                F.sum(F.xxhash64(F.col("node"), F.col("comp")).cast("decimal(38,0)")).alias("h")
            ).collect()[0]
            return row.h

        prev_fp = fingerprint(labels)
        for _ in range(max_iterations):
            # neighbor propagation: candidate label for a = label(b)
            prop = (
                sym.join(labels.withColumnRenamed("node", "b"), on="b")
                .select(F.col("a").alias("node"), "comp")
            )
            new_labels = (
                labels.unionByName(prop)
                .groupBy("node")
                .agg(F.min("comp").alias("comp"))
            )
            # pointer jumping: comp <- label(comp) (path halving)
            jumped = (
                new_labels.alias("l")
                .join(
                    new_labels.select(
                        F.col("node").alias("comp"), F.col("comp").alias("comp2")
                    ).alias("r"),
                    on="comp",
                    how="left",
                )
                .select(F.col("node"), F.coalesce(F.col("comp2"), F.col("comp")).alias("comp"))
                # lazy: materializes during the fingerprint aggregation —
                # one job per round, not two
                .localCheckpoint(eager=False)
            )
            labels = jumped
            fp = fingerprint(labels)
            if fp == prev_fp:
                return labels
            prev_fp = fp
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iterations} iterations"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
