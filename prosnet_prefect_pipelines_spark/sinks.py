"""Sinks (SURVEY §2.9): JSON docs, idempotent batch upsert, publication hooks.

- K3 JSON doc sink: distributed ``df.write.json``; the reference's single
  pretty-printed file (geonames_place_index.py:44-53) is a driver-edge
  presentation option.
- K1/K2 Typesense-style upsert: ``foreachPartition`` batch import with an
  injected client factory — idempotent per upsert key under task retries
  (push_to_typesense.py:23-53). Tests inject a fake client; production
  wires the typesense SDK behind the same callable.
- K5-K8 (git push, PR/MR creation, markdown report, Slack notify) are
  driver-side publication hooks, out of the execution engine by design
  (SURVEY §2.9) — modeled as plain callables invoked after the write.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, Row


def write_json_docs(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False) -> None:
    """K3: JSON-lines doc dump (geonames_place_index.py:44-53)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).json(path)


def upsert_foreach_partition(
    df: DataFrame,
    make_client: Callable[[], "UpsertClient"],
    batch_size: int = 100,
) -> None:
    """K1/K2: batched idempotent upsert via foreachPartition.

    ``make_client`` is constructed INSIDE each task (connections are not
    picklable and must not be shared across executors). Batches mirror the
    reference's documents.import_(..., action="upsert") — exactly-once per
    key under retries because the key makes redelivery idempotent.
    """

    def run(rows: Iterator[Row]) -> None:
        client = make_client()
        client.ensure_collection()
        batch: list[dict] = []
        for row in rows:
            batch.append(row.asDict(recursive=True))
            if len(batch) >= batch_size:
                client.upsert_batch(batch)
                batch = []
        if batch:
            client.upsert_batch(batch)

    df.foreachPartition(run)


class UpsertClient:
    """Protocol for K1/K2 clients (duck-typed; see tests for a fake)."""

    def ensure_collection(self) -> None:  # K1 get-or-create
        raise NotImplementedError

    def upsert_batch(self, docs: list[dict]) -> None:  # K2 bulk upsert
        raise NotImplementedError


class LocalJsonUpsertClient(UpsertClient):
    """File-backed upsert client: append JSON lines to a per-task file.

    Stands in for the Typesense SDK in tests/local runs; upsert key
    semantics (last-write-wins by id) are applied at read-back.
    """

    def __init__(self, directory: str) -> None:
        self.directory = directory

    def ensure_collection(self) -> None:
        import os

        os.makedirs(self.directory, exist_ok=True)

    def upsert_batch(self, docs: list[dict]) -> None:
        import os
        import uuid

        p = os.path.join(self.directory, f"batch-{uuid.uuid4().hex}.jsonl")
        with open(p, "w") as f:
            for d in docs:
                f.write(json.dumps(d, sort_keys=True) + "\n")


def publication_hook(
    artifact_path: str,
    steps: list[Callable[[str], None]],
) -> None:
    """K5-K8 driver-side chain: run each publication step on the written
    artifact (git commit/push, create PR/MR, report, notify). Steps are
    injected callables — the engine only sequences them
    (push_rdf_file_to_github_gitlab.py:136-177 shape)."""
    for step in steps:
        step(artifact_path)


def bucketed_materialize(
    df: "DataFrame",
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    path: str | None = None,
) -> "DataFrame":
    """Materialize ``df`` as a bucketed (and optionally sorted) table and
    return it re-read — the co-located-join primitive.

    Repeated joins/aggregations on ``bucket_col`` between tables bucketed
    with the same bucket count read pre-shuffled data: Catalyst plans the
    join with ZERO Exchange on either side (asserted in tests). At 100 TB
    this converts every recurring fact-fact join on the entity key from a
    full shuffle into a local merge — the batch analog of co-partitioned
    stream-stream joins. Buckets also bound task input size (size
    n_buckets so |table|/n_buckets fits an executor's memory).
    """
    spark = df.sparkSession
    writer = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    if path is not None:
        # external table: explicit location, independent of the session's
        # (static, possibly read-only-cwd) spark.sql.warehouse.dir
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return spark.table(table)


def manifest_commit(df: DataFrame, table_path: str) -> int:
    """Atomic snapshot commit (the Iceberg/Delta primitive, minimal):
    write the batch's parquet files under a unique commit directory,
    then atomically publish a new manifest listing ALL live commit
    directories. Readers resolve a manifest — never the directory tree —
    so concurrent/failed writes are invisible until their single
    manifest rename lands, and every snapshot stays readable forever
    (time travel = read an old manifest). Returns the snapshot version.

    On an object store the manifest rename becomes a conditional PUT;
    everything else is unchanged — data files are immutable once
    written, which is what makes 100 TB commits cheap: a commit moves
    one small JSON, never data.
    """
    import json
    import os

    os.makedirs(table_path, exist_ok=True)
    versions = [
        int(f.split("-")[1].split(".")[0])
        for f in os.listdir(table_path)
        if f.startswith("manifest-") and f.endswith(".json")
    ]
    prev = max(versions) if versions else 0
    prev_dirs: list[str] = []
    if prev:
        with open(os.path.join(table_path, f"manifest-{prev}.json")) as fh:
            prev_dirs = json.load(fh)["commits"]
    version = prev + 1
    commit_dir = f"commit-{version}"
    df.write.mode("overwrite").parquet(os.path.join(table_path, commit_dir))
    tmp = os.path.join(table_path, f".manifest-{version}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump({"version": version, "commits": prev_dirs + [commit_dir]}, fh)
    os.replace(tmp, os.path.join(table_path, f"manifest-{version}.json"))
    return version


def read_snapshot(spark, table_path: str, version: int | None = None) -> DataFrame:
    """Read a manifest snapshot (latest by default) — only files listed
    by that manifest, regardless of what else sits in the directory
    (half-written commits, newer snapshots, orphans)."""
    import json
    import os

    if version is None:
        version = max(
            int(f.split("-")[1].split(".")[0])
            for f in os.listdir(table_path)
            if f.startswith("manifest-") and f.endswith(".json")
        )
    with open(os.path.join(table_path, f"manifest-{version}.json")) as fh:
        commits = json.load(fh)["commits"]
    paths = [os.path.join(table_path, c) for c in commits]
    return spark.read.parquet(*paths)
