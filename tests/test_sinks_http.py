"""K1/K2 end-to-end over a real socket: upsert_foreach_partition ->
HttpUpsertClient -> an in-process HTTP server speaking the Typesense
batch-import protocol (get-or-create collection, JSONL import?action=
upsert, per-line {"success": bool} responses).

Asserts the two properties the reference relies on
(push_to_typesense.py:23-53): retry-safety (an injected transient 503
is absorbed by the client's retry loop) and idempotency (re-importing
documents with the same ids overwrites — never duplicates)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from prosnet_prefect_pipelines_spark.sinks import (
    HttpUpsertClient,
    upsert_foreach_partition,
)


class _State:
    def __init__(self):
        self.lock = threading.Lock()
        self.collections: dict[str, dict[str, dict]] = {}
        self.fail_next_imports = 0  # injected transient 503s
        self.truncate_next_response = False  # drop one result line once
        self.n_import_requests = 0
        self.n_create_requests = 0


def _make_handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, body: bytes):
            self.send_response(code)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            name = self.path.rsplit("/", 1)[-1]
            with state.lock:
                exists = name in state.collections
            if exists:
                self._send(200, json.dumps({"name": name}).encode())
            else:
                self._send(404, b"{}")

        def do_POST(self):
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            if self.path == "/collections":
                # Typesense rejects a mislabeled collection-create body;
                # enforce it so a Content-Type regression fails loudly
                if self.headers.get("Content-Type") != "application/json":
                    self._send(400, b'{"message": "expected application/json"}')
                    return
                spec = json.loads(body)
                with state.lock:
                    state.n_create_requests += 1
                    created = spec["name"] not in state.collections
                    state.collections.setdefault(spec["name"], {})
                self._send(201 if created else 409, body)
                return
            if "/documents/import" in self.path:
                name = self.path.split("/collections/", 1)[1].split("/", 1)[0]
                with state.lock:
                    state.n_import_requests += 1
                    if state.fail_next_imports > 0:
                        state.fail_next_imports -= 1
                        self._send(503, b"try again")
                        return
                    store = state.collections.setdefault(name, {})
                    lines = [json.loads(x) for x in body.splitlines() if x.strip()]
                    for doc in lines:
                        store[str(doc["id"])] = doc  # upsert: last write wins
                results = ['{"success": true}' for _ in lines]
                if state.truncate_next_response:
                    state.truncate_next_response = False
                    results = results[: max(len(results) - 1, 0)]
                self._send(200, "\n".join(results).encode())
                return
            self._send(404, b"{}")

    return Handler


@pytest.fixture()
def http_sink():
    state = _State()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}", state
    finally:
        server.shutdown()


def test_http_upsert_roundtrip_retry_and_idempotency(spark, sf_dir, http_sink):
    url, state = http_sink
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    from pyspark.sql import functions as F

    docs = nation.select(
        F.col("n_nationkey").cast("string").alias("id"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").cast("int").alias("region"),
    )
    n_docs = docs.count()

    # one transient 503 on the first import: the client's retry loop must
    # absorb it without surfacing a task failure OR duplicating documents
    state.fail_next_imports = 1
    upsert_foreach_partition(
        docs, lambda: HttpUpsertClient(url, "nations", backoff_s=0.01), batch_size=7
    )
    with state.lock:
        store = dict(state.collections["nations"])
        n_imports_first = state.n_import_requests
    assert len(store) == n_docs  # every id exactly once
    assert n_imports_first > 1  # the 503 really forced a retry

    # second run with changed payloads: same ids -> overwrite, not append
    docs2 = docs.withColumn("name", F.upper(F.col("name")))
    upsert_foreach_partition(
        docs2, lambda: HttpUpsertClient(url, "nations", backoff_s=0.01), batch_size=7
    )
    with state.lock:
        store2 = dict(state.collections["nations"])
    assert len(store2) == n_docs
    assert all(d["name"] == d["name"].upper() for d in store2.values())
    # collection get-or-create races are tolerated (409 path), and at
    # least one create happened
    assert state.n_create_requests >= 1


def test_http_upsert_rejects_failed_documents(http_sink):
    url, state = http_sink
    client = HttpUpsertClient(url, "c1", backoff_s=0.01)
    client.ensure_collection()
    client.upsert_batch([{"id": "1", "v": 1}])
    with state.lock:
        assert state.collections["c1"]["1"]["v"] == 1
    # a persistent outage (more 503s than retries) must surface an error
    state.fail_next_imports = 10
    with pytest.raises(RuntimeError, match="failed after"):
        HttpUpsertClient(url, "c1", retries=1, backoff_s=0.01).upsert_batch(
            [{"id": "2", "v": 2}]
        )


def test_http_upsert_truncated_response_detected(http_sink):
    """A 200 import response carrying FEWER per-line results than docs
    sent (connection cut mid-body, proxy truncation) must raise — the
    missing lines' outcomes are unknown, and the surviving lines all
    saying success is exactly the case that used to pass silently."""
    url, state = http_sink
    client = HttpUpsertClient(url, "c2", backoff_s=0.01)
    client.ensure_collection()
    state.truncate_next_response = True
    with pytest.raises(RuntimeError, match="truncated"):
        client.upsert_batch([{"id": "1", "v": 1}, {"id": "2", "v": 2}])
    # intact response: same docs go through
    client.upsert_batch([{"id": "1", "v": 1}, {"id": "2", "v": 2}])
    with state.lock:
        assert len(state.collections["c2"]) == 2
