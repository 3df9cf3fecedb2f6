"""Source/sink-surface queries with DuckDB oracles for the §2 operators
that previously had only module tests: S8 (GeoNames TSV scan -> place
docs), P6 (URL-template filter), F10 (Wikidata id rebuild), K3 (JSON
sink round-trip).

The GeoNames queries read a deterministic fixture TSV checked into the
repo (tests/fixtures/geonames_sample.tsv) — the oracle reads the SAME
file via DuckDB ``read_csv``, so parsing, casting, and projection are
compared end-to-end, mirroring the reference pipeline
prosnet-prefect-pipelines/geonames_place_index.py:13-53.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.model import GEONAMES_COLUMNS
from prosnet_prefect_pipelines_spark.operators.relational import drop_url_templates
from prosnet_prefect_pipelines_spark.plans.catalog import register
from prosnet_prefect_pipelines_spark.plans.tpch_graph import TRIPLES_CTE, triples_from_tpch
from prosnet_prefect_pipelines_spark.sources.geonames import build_place_docs, read_geonames_tsv

FIXTURE_TSV = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "geonames_sample.tsv",
)

_DUCK_TYPES = {"DoubleType()": "DOUBLE", "LongType()": "BIGINT"}
_GEONAMES_READ_CSV = (
    f"read_csv('{FIXTURE_TSV}', delim='\\t', header=false, columns={{"
    + ", ".join(
        f"'{n}': '{_DUCK_TYPES.get(str(t), 'VARCHAR')}'" for n, t in GEONAMES_COLUMNS
    )
    + "})"
)

GEONAMES_DOCS_SQL = f"""
SELECT 'https://sws.geonames.org/' || id || '/' AS id,
       printf('%s (%s) - %s', name, country_code, feature_code) AS label,
       name,
       country_code AS country,
       feature_code,
       CAST(latitude AS DOUBLE) AS lat,
       CAST(longitude AS DOUBLE) AS lng
FROM {_GEONAMES_READ_CSV}
"""


@register("geonames_place_docs", oracle=GEONAMES_DOCS_SQL, covers=["S8", "P2", "F8", "F9", "K3"])
def q_geonames_place_docs(spark, sf_dir):
    """S8 + P2: headerless 19-column GeoNames TSV -> place search docs
    (F9 id URI, F8 label, double lat/lng), the full
    geonames_place_index.py:13-43 pipeline against a fixture TSV."""
    docs = build_place_docs(read_geonames_tsv(spark, FIXTURE_TSV))
    return docs.select(
        "id", "label", "name", "country", "feature_code",
        F.element_at("coordinates", 1).alias("lat"),
        F.element_at("coordinates", 2).alias("lng"),
    )


# routes derived deterministically from events: every 3rd route keeps an
# un-expanded {id} template parameter, like a raw swagger route listing
ROUTE_CTE = """
routes AS (
    SELECT event_id,
           '/apis/api/' || event_type ||
           CASE WHEN event_id % 3 = 0 THEN '/{id}'
                ELSE '/' || CAST(event_id AS VARCHAR) END AS route
    FROM events
)
"""

URL_TEMPLATE_FILTER_SQL = f"""
WITH {ROUTE_CTE}
SELECT event_id, route FROM routes WHERE route NOT LIKE '%{{%'
"""


@register("url_template_filter", oracle=URL_TEMPLATE_FILTER_SQL, covers=["P6"])
def q_url_template_filter(spark, sf_dir):
    """P6: drop swagger routes still containing a {param} placeholder
    (get_data_from_apis_instance.py:185)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    routes = events.select(
        "event_id",
        F.concat(
            F.lit("/apis/api/"),
            F.col("event_type"),
            F.when(F.col("event_id") % 3 == 0, F.lit("/{id}")).otherwise(
                F.concat(F.lit("/"), F.col("event_id").cast("string"))
            ),
        ).alias("route"),
    )
    return drop_url_templates(routes, "route")


WIKIDATA_REBUILD_SQL = f"""
WITH {TRIPLES_CTE}
SELECT DISTINCT o AS uri,
       'http://www.wikidata.org/entity/' || regexp_extract(o, '([^/]+)$', 1) AS canonical
FROM triples
WHERE p = 'owl:sameAs'
"""


@register("wikidata_uri_rebuild", oracle=WIKIDATA_REBUILD_SQL, covers=["F10", "P3"])
def q_wikidata_uri_rebuild(spark, sf_dir):
    """F10: rebuild the canonical wikidata entity URI from the last
    /-segment of a sameAs link (wikidata_index.py:199-201)."""
    from prosnet_prefect_pipelines_spark.functions.scalar import wikidata_id_rebuild

    t = triples_from_tpch(spark, sf_dir)
    return (
        t.filter(F.col("p") == "owl:sameAs")
        .select(F.col("o").alias("uri"), wikidata_id_rebuild(F.col("o")).alias("canonical"))
        .distinct()
    )


BUCKETED_JOIN_SQL = """
SELECT c.c_custkey, c.c_acctbal, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_acctbal
"""


@register("bucketed_join_colocated", oracle=BUCKETED_JOIN_SQL, covers=["J1", "A2"])
def q_bucketed_join_colocated(spark, sf_dir):
    """Co-located join on pre-bucketed tables: customer and orders are
    materialized bucketed by the join key (16 buckets), so the join AND
    the follow-on per-customer aggregation read pre-shuffled data — the
    audit asserts the whole plan has no shuffle exchange at all. At
    100 TB this turns every recurring fact-fact join on the entity key
    from a full shuffle into a local merge. Tables build once per
    warehouse; reruns reuse them."""
    import os

    from prosnet_prefect_pipelines_spark.sinks import bucketed_materialize

    import shutil
    import tempfile

    from prosnet_prefect_pipelines_spark.streaming.staging import (
        private_stage_dir,
    )

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = private_stage_dir("bucketed")

    def bucketed(name, build):
        # EXTERNAL tables under /tmp: the driver's session has a static
        # warehouse dir rooted at ITS cwd, which may not be writable.
        # The in-memory catalog forgets tables across sessions while the
        # data directory persists: reuse registered tables, clear stale
        # unregistered locations before rebuilding.
        if spark.catalog.tableExists(name):
            return spark.table(name)
        loc = os.path.join(base, name)
        shutil.rmtree(loc, ignore_errors=True)
        return build(name, loc)

    bo = bucketed(
        f"b_orders_{tag}",
        lambda n, loc: bucketed_materialize(
            spark.read.parquet(f"{sf_dir}/orders.parquet").select(
                "o_orderkey", "o_custkey"
            ),
            n, "o_custkey", 16, path=loc,
        ),
    )
    bc = bucketed(
        f"b_cust_{tag}",
        lambda n, loc: bucketed_materialize(
            spark.read.parquet(f"{sf_dir}/customer.parquet").select(
                "c_custkey", "c_acctbal"
            ),
            n, "c_custkey", 16, path=loc,
        ),
    )
    return (
        bc.join(bo, bc["c_custkey"] == bo["o_custkey"])
        .groupBy("c_custkey", "c_acctbal")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


PARTITIONED_SQL = """
SELECT doc_id, lang, source, n_chars FROM documents WHERE lang = 'de'
"""


@register("partitioned_write_prune", oracle=PARTITIONED_SQL, covers=["K3"])
def q_partitioned_write_prune(spark, sf_dir):
    """Hive-style partitioned parquet layout + partition-pruned read-back:
    documents written partitionBy(lang), then read with a lang predicate
    that prunes to ONE directory (PartitionFilters in the plan, asserted
    by the explain audit) — the table-layout primitive that turns a
    100 TB scan into a per-partition read. Write once per session+sf;
    reruns reuse the layout."""
    import os
    import tempfile

    from prosnet_prefect_pipelines_spark.streaming.staging import (
        private_stage_dir,
        source_fingerprint,
    )

    # content-keyed: a regenerated documents table gets a fresh layout
    # instead of serving a stale _SUCCESS-marked one
    out = private_stage_dir(
        f"part_{os.path.basename(sf_dir.rstrip('/'))}_"
        f"{source_fingerprint(f'{sf_dir}/documents.parquet')}"
    )
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    back = spark.read.parquet(out).filter(F.col("lang") == "de")
    return back.select("doc_id", "lang", "source", "n_chars")


SWAGGER_SQL = """
WITH types AS (SELECT DISTINCT event_type FROM events),
routes AS (
    SELECT '/apis/api/' || event_type AS route, event_type FROM types
    UNION ALL
    SELECT '/apis/api/' || event_type || '/{id}', event_type FROM types
),
keep AS (SELECT route, event_type FROM routes WHERE route NOT LIKE '%{%')
SELECT k.route, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM keep k JOIN events e ON e.event_type = k.event_type
GROUP BY k.route
"""


@register("swagger_route_discovery", oracle=SWAGGER_SQL, covers=["S5", "P6", "F21"])
def q_swagger_route_discovery(spark, sf_dir):
    """S5: route discovery off a swagger document — the spec is a small
    driver-side artifact (as in the reference,
    get_data_from_apis_instance.py:178-187): parse its paths, drop
    {param}-templated routes, then fan the kept routes out over the data
    (here: row counts per discovered route). The fan-out join is the
    distributed part; the spec itself never needs to be."""
    import json

    from prosnet_prefect_pipelines_spark.operators.relational import drop_url_templates

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    types = sorted(r.event_type for r in events.select("event_type").distinct().collect())
    spec = json.dumps(
        {"paths": {p: {"get": {}} for t in types
                   for p in (f"/apis/api/{t}", "/apis/api/" + t + "/{id}")}}
    )
    spec_df = spark.createDataFrame([(spec,)], "spec string")
    routes = spec_df.select(
        F.explode(
            F.json_object_keys(F.get_json_object("spec", "$.paths"))
        ).alias("route")
    )
    kept = drop_url_templates(routes, "route").withColumn(
        "event_type", F.regexp_extract("route", "^/apis/api/([^/]+)", 1)
    )
    return (
        events.join(F.broadcast(kept), "event_type")
        .groupBy("route")
        .agg(F.count("*").alias("n_rows"))
    )


UPSERT_ROUNDTRIP_SQL = """
WITH runs AS (
    SELECT c_custkey AS id, c_name AS name, 1 AS seq FROM customer
    UNION ALL
    SELECT c_custkey, upper(c_name), 2 FROM customer WHERE c_custkey % 5 = 0
)
SELECT id, name, seq FROM runs
QUALIFY row_number() OVER (PARTITION BY id ORDER BY seq DESC) = 1
"""


@register("typesense_upsert_roundtrip", oracle=UPSERT_ROUNDTRIP_SQL, covers=["K1", "K2"])
def q_typesense_upsert_roundtrip(spark, sf_dir):
    """K1/K2: two sequential doc batches pushed through the
    foreachPartition upsert sink (get-or-create collection + batched
    import, push_to_typesense.py:23-53) into the file-backed client, read
    back with last-write-wins by (id, seq) — the reference's
    action="upsert" semantics checked end-to-end."""
    import os
    import shutil
    import tempfile

    from pyspark.sql.window import Window

    from prosnet_prefect_pipelines_spark.sinks import (
        LocalJsonUpsertClient,
        upsert_foreach_partition,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    run1 = cust.select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name"),
        F.lit(1).alias("seq"),
    )
    run2 = cust.filter(F.col("c_custkey") % 5 == 0).select(
        F.col("c_custkey").alias("id"), F.upper("c_name").alias("name"),
        F.lit(2).alias("seq"),
    )
    from prosnet_prefect_pipelines_spark.streaming.staging import (
        private_stage_dir,
    )

    out = private_stage_dir("upsert_sink")
    shutil.rmtree(out, ignore_errors=True)
    for batch in (run1, run2):
        upsert_foreach_partition(batch, lambda: LocalJsonUpsertClient(out), batch_size=500)
    docs = spark.read.schema("id long, name string, seq int").json(out)
    w = Window.partitionBy("id").orderBy(F.col("seq").desc())
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("id", "name", "seq")
    )


REST_SCAN_SQL = """
SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
FROM orders
WHERE strftime(o_orderdate, '%Y-%m-%d') >= '1997-01-01'
"""


@register(
    "rest_paginated_scan",
    oracle=REST_SCAN_SQL,
    covers=["S1", "S2", "S4", "S6", "T4", "F17"],
)
def q_rest_paginated_scan(spark, sf_dir):
    """S1/S4/S6: the paginated-REST Python Data Source against a
    parquet-paged endpoint stand-in — count sizes the offset partitions
    (the reference's derived COUNT envelope, wikidata_index.py:148-151),
    executors fetch pages in parallel with pacing + bounded retries (T4),
    and the incremental-date comparison is offered to pushFilters (F17);
    whether the endpoint honors it or not, read()'s residual guard keeps
    the result identical."""
    import pyarrow.parquet as pq

    from prosnet_prefect_pipelines_spark.sources.rest_datasource import (
        PaginatedRestDataSource,
    )

    spark.dataSource.register(PaginatedRestDataSource)
    path = f"{sf_dir}/orders.parquet"
    count = pq.read_metadata(path).num_rows
    df = (
        spark.read.format("paginated_rest")
        .schema("o_orderkey long, o_custkey long, o_orderdate string")
        .option(
            "fetcher",
            "prosnet_prefect_pipelines_spark.sources.rest_datasource"
            ":parquet_orders_fetch_page",
        )
        .option("fetcher_arg", path)
        .option("count", count)
        .option("page_size", 2000)
        .option("retries", 2)
        .load()
    )
    return df.filter(F.col("o_orderdate") >= "1997-01-01")


FEDERATED_SQL = """
SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE strftime(o.o_orderdate, '%Y-%m-%d') >= '1997-01-01'
GROUP BY c.c_mktsegment
"""


@register("federated_rest_join", oracle=FEDERATED_SQL, covers=["S6", "J1", "A2"])
def q_federated_rest_join(spark, sf_dir):
    """Federation: one plan joining a paginated REST endpoint (orders via
    the Python Data Source, incremental-date filter offered to pushdown)
    against a parquet dimension (customer) — the lakehouse-joins-API
    shape the reference runs as separate fetch-then-load steps, here a
    single declarative query Catalyst plans end-to-end."""
    rest_orders = q_rest_paginated_scan(spark, sf_dir)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        rest_orders.join(cust, rest_orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


JSON_ROUNDTRIP_SQL = f"""
SELECT 'https://sws.geonames.org/' || id || '/' AS id,
       printf('%s (%s) - %s', name, country_code, feature_code) AS label,
       name,
       country_code AS country,
       feature_code
FROM {_GEONAMES_READ_CSV}
"""


@register("json_sink_roundtrip", oracle=JSON_ROUNDTRIP_SQL, covers=["K3", "S8"])
def q_json_sink_roundtrip(spark, sf_dir):
    """K3: place docs written through the JSON-lines sink and read back —
    the reference's JSON doc dump (geonames_place_index.py:44-53),
    checked for write->read fidelity against the source projection."""
    import tempfile

    from prosnet_prefect_pipelines_spark.sinks import write_json_docs

    docs = build_place_docs(read_geonames_tsv(spark, FIXTURE_TSV)).select(
        "id", "label", "name", "country", "feature_code"
    )
    from prosnet_prefect_pipelines_spark.streaming.staging import (
        private_stage_dir,
    )

    out = private_stage_dir("json_sink")
    write_json_docs(docs, out)
    return spark.read.schema(
        "id string, label string, name string, country string, feature_code string"
    ).json(out)
