"""prosnet_prefect_pipelines_spark — a PySpark-native analytics engine.

Brand-new engine with the query and data-processing capabilities of
acdh-oeaw/prosnet-prefect-pipelines (see SURVEY.md), re-expressed as
idiomatic Spark DataFrame / SQL plans:

- ``model``      canonical schemas (triples, SPARQL bindings, docs, GeoNames)
- ``session``    scale-oriented SparkSession factory
- ``functions``  registry of scalar Column->Column transforms (SURVEY §2.7)
- ``operators``  relational + custom operators (SURVEY §2.3-2.6, extensions)
- ``sources``    scans: TSV, SPARQL bindings, REST JSON, RDF text (SURVEY §2.1)
- ``render``     row -> triples template explode (SURVEY §2.8)
- ``sinks``      JSON / N-Triples / upsert sinks (SURVEY §2.9)
- ``streaming``  incremental batch + structured streaming (SURVEY §2.10)
- ``plans``      end-to-end pipelines and the driver-facing query catalog
"""

__version__ = "0.1.0"
