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


class HttpUpsertClient(UpsertClient):
    """K1/K2 over a real socket: speaks the Typesense batch-import wire
    protocol (push_to_typesense.py:23-53 semantics) with stdlib urllib —
    GET /collections/{name} (404 -> POST /collections to create, the
    get-or-create K1 step), then POST /collections/{name}/documents/
    import?action=upsert with a JSON-lines body per batch (K2).

    Transient failures (connection errors, HTTP 5xx) retry with linear
    backoff; because every document carries its id and the action is
    upsert, a replayed batch is idempotent — the retry loop cannot
    duplicate documents. Import responses are JSONL of per-document
    {"success": bool}; any false fails the task (Spark retries the
    partition, again idempotent).

    Built on urllib so executors need no extra dependency; the real
    typesense SDK slots behind the same ``UpsertClient`` protocol.
    """

    def __init__(
        self,
        base_url: str,
        collection: str,
        schema: dict | None = None,
        retries: int = 3,
        backoff_s: float = 0.2,
        timeout_s: float = 10.0,
        api_key: str | None = None,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.collection = collection
        self.schema = schema or {"name": collection}
        self.retries = retries
        self.backoff_s = backoff_s
        self.timeout_s = timeout_s
        self.api_key = api_key

    def _request(
        self,
        method: str,
        path: str,
        body: bytes | None = None,
        content_type: str = "text/plain",
    ) -> tuple[int, bytes]:
        import time
        import urllib.error
        import urllib.request

        # JSONL document imports go as text/plain (newline-delimited
        # bodies); structural endpoints (collection create) are JSON and
        # the server is entitled to reject a mislabeled body
        headers = {"Content-Type": content_type}
        if self.api_key:
            headers["X-TYPESENSE-API-KEY"] = self.api_key
        last: Exception | None = None
        for attempt in range(self.retries + 1):
            req = urllib.request.Request(
                self.base_url + path, data=body, method=method, headers=headers
            )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                    return resp.status, resp.read()
            except urllib.error.HTTPError as e:
                if e.code < 500:  # 4xx is a protocol answer, not transient
                    return e.code, e.read()
                last = e
            except urllib.error.URLError as e:
                last = e
            if attempt < self.retries:
                time.sleep(self.backoff_s * (attempt + 1))
        raise RuntimeError(f"{method} {path} failed after {self.retries + 1} tries: {last}")

    def ensure_collection(self) -> None:
        status, _ = self._request("GET", f"/collections/{self.collection}")
        if status == 404:
            create_status, body = self._request(
                "POST",
                "/collections",
                json.dumps(self.schema).encode(),
                content_type="application/json",
            )
            # 409 = another task created it concurrently — get-or-create
            if create_status not in (200, 201, 409):
                raise RuntimeError(f"create collection failed: {create_status} {body!r}")
        elif status != 200:
            raise RuntimeError(f"get collection failed: {status}")

    def upsert_batch(self, docs: list[dict]) -> None:
        payload = "\n".join(json.dumps(d, sort_keys=True) for d in docs).encode()
        status, body = self._request(
            "POST",
            f"/collections/{self.collection}/documents/import?action=upsert",
            payload,
        )
        if status != 200:
            raise RuntimeError(f"import failed: HTTP {status} {body!r}")
        results = [json.loads(line) for line in body.splitlines() if line.strip()]
        # one result line per submitted doc — a truncated import response
        # whose surviving lines all say success must NOT pass silently
        if len(results) != len(docs):
            raise RuntimeError(
                f"import response truncated: {len(results)} results for {len(docs)} docs"
            )
        failed = [r for r in results if not r.get("success")]
        if failed:
            raise RuntimeError(f"{len(failed)}/{len(results)} documents rejected: {failed[:3]}")


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
