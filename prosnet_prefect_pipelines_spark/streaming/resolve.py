"""Streaming entity resolution: incremental sameAs connected components.

The streaming twin of ``resolve.resolve_same_as`` (r6 verdict stretch,
batch 114): the reference's enrichment loop re-runs the FULL sameAs
CONSTRUCT over the whole graph store on every scheduled pass
(pfp-prefect-pipelines enrich_via_sparql.py:146-166 — each run rebuilds
create_provided_entities_graph_v2.sparql's cluster resolution from
scratch); this monitor keeps cluster state incrementally, so an arriving
batch of sameAs assertions pays work proportional to the DELTA, never to
the accumulated graph.

Algorithm (per micro-batch, inside foreachBatch):

1. CONTRACT: map both endpoints of every new edge through the current
   (node -> comp) mapping (unmapped nodes map to themselves). Edges
   whose endpoints land in the same component carry no new information
   and drop out; the survivors form a component-level graph whose size
   is bounded by the batch, not the history.
2. MERGE: connected components over that contracted graph (the adaptive
   operator — small deltas take the driver union-find fast path, a
   backfill-sized batch takes the distributed large/small-star path).
3. RELABEL: components that merged get the new min label via one keyed
   join against the mapping; endpoints never seen before are appended.

Correctness under ANY micro-batch slicing: labels are always the minimum
member node id, and min-label merging is associative, commutative, and
idempotent — a confluent semilattice — so the fixpoint after replaying
the edges in any batch order equals the single-shot batch components.
That is what makes an EXACT DuckDB oracle possible under availableNow
replay (same claim, and same verification style, as the batch-113
near-dup monitor).

Scale notes (100 TB): the mapping is a (node, comp) table partitioned by
node — the only per-batch full-table operation is one keyed join against
the (usually tiny) merged-label table, which Spark broadcasts; edge
contraction touches only the batch. State here is held as an eagerly
localCheckpoint-ed DataFrame (replay-oracle context); a production
deployment would keep it in a keyed table store (Delta MERGE / RocksDB
state) with identical semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.operators.graph import connected_components
from prosnet_prefect_pipelines_spark.session import unpersist_checkpoint


class IncrementalResolver:
    """Accumulates connected components over an edge stream, one
    micro-batch at a time. ``mapping()`` is always equal to
    ``connected_components(all edges so far)``."""

    def __init__(self, spark):
        self._spark = spark
        self._mapping: DataFrame | None = None  # (node, comp)

    def update(self, edges: DataFrame) -> None:
        """Fold one batch of (src, dst) edges into the component state."""
        # a foreachBatch frame re-executes its micro-batch subplan on
        # every reference; e feeds the contraction AND both endpoint
        # branches, so checkpoint it (batch-sized). Lazy: the first
        # consumer (the contraction's edge count) materializes it and
        # every later reference reads the blocks — one fewer scheduled
        # job per batch than an eager barrier.
        e = (
            edges.select(F.col("src").cast("string"), F.col("dst").cast("string"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        m = self._mapping
        if m is None:
            self._mapping = connected_components(e).localCheckpoint()
            unpersist_checkpoint(e)
            return

        # 1. contract: endpoints -> current labels (self when unseen)
        ms = m.select(F.col("node").alias("src"), F.col("comp").alias("_cs"))
        md = m.select(F.col("node").alias("dst"), F.col("comp").alias("_cd"))
        mapped = (
            e.join(ms, on="src", how="left")
            .join(md, on="dst", how="left")
            .select(
                F.coalesce(F.col("_cs"), F.col("src")).alias("src"),
                F.coalesce(F.col("_cd"), F.col("dst")).alias("dst"),
            )
        )
        # lazy: materializes once at connected_components' first pass and
        # is reused by its second (count + collect on the fast path) —
        # one fewer scheduled job per batch than an eager barrier
        contracted = mapped.where(
            F.col("src") != F.col("dst")
        ).distinct().localCheckpoint(eager=False)

        # 2. merge the contracted component graph (batch-sized, adaptive)
        cc = connected_components(contracted)

        # 3a. relabel existing nodes whose component merged
        relabel = cc.select(F.col("node").alias("comp"), F.col("comp").alias("_new"))
        m2 = m.join(relabel, on="comp", how="left").select(
            "node", F.coalesce(F.col("_new"), F.col("comp")).alias("comp")
        )
        # 3b. append never-seen endpoints with their merged label (every
        # new node survives contraction: it cannot already share a
        # component with anything, so none of its edges collapse)
        ends = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        new_nodes = ends.join(m.select("node"), on="node", how="left_anti")
        adds = new_nodes.join(cc, on="node", how="left").select(
            "node", F.coalesce(F.col("comp"), F.col("node")).alias("comp")
        )
        self._mapping = m2.unionByName(adds).localCheckpoint()
        # the new mapping is EAGERLY checkpointed above, so the previous
        # mapping and this batch's contracted delta are dead — release
        # their blocks (state otherwise grows by one full mapping copy
        # per micro-batch for the session's lifetime). Callers holding a
        # pre-update ``mapping()`` frame must re-fetch after update().
        unpersist_checkpoint(m)
        unpersist_checkpoint(contracted)
        unpersist_checkpoint(e)

    def mapping(self) -> DataFrame:
        """(node, comp) for every node seen so far (min-member labels)."""
        if self._mapping is None:
            schema = "node string, comp string"
            return self._spark.createDataFrame([], schema)
        return self._mapping

    def save(self, path: str) -> None:
        """Persist the component mapping as parquet — the restart story.

        The source offsets live in the streaming query's
        ``checkpointLocation``; the mapping is the OTHER half of the
        resolver's state and lives driver-side, so a process restart
        needs it externalized. save() after each run + :meth:`restore`
        on the next run gives exactly-once resumption: the restarted
        query replays only unconsumed source files (offset log) and
        folds them into the saved mapping. On a cluster this parquet is
        the keyed table store the module docstring promises (Delta
        MERGE-able; here plain parquet overwrite of a node-partitioned
        table)."""
        self.mapping().write.mode("overwrite").parquet(path)

    @classmethod
    def restore(cls, spark, path: str) -> "IncrementalResolver":
        """Resume from a :meth:`save`-d mapping (fresh driver process)."""
        r = cls(spark)
        r._mapping = spark.read.parquet(path).localCheckpoint()
        return r
