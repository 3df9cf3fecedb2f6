"""S9/S10 + K4: N-Triples/N-Quads text <-> triples DataFrame.

The reference loads whole ttl directories into a pyoxigraph Store
(enrich_via_sparql.py:12-46), unions page chunks into one rdflib Graph
(get_data_from_apis_instance.py:78-94), and serializes with
``graph.serialize`` (:97-102, get_data_apis_vanilla.py:1050-1074).

Engine shape: line-based N-Triples — ``spark.read.text`` is splittable,
the grammar is per-line regular, parse/serialize are pure Column
expressions (no Python in the loop). Turtle prettification, like the
reference's, is a presentation concern at the driver edge.

Named graphs (S10): a constant ``g`` column per chunk source
(``lit(named_graph_uri)``) — the rdflib Dataset context at
get_data_from_apis_instance.py:84-88.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# N-Triples line: <s> <p> (<uri> | "literal"(@lang|^^<dt>)?) .
_NT_PATTERN = (
    r'^<([^>]*)> <([^>]*)> (?:<([^>]*)>|"((?:[^"\\]|\\.)*)"'
    r"(?:@([a-zA-Z-]+)|\^\^<([^>]*)>)?) \.$"
)


def _escape(c):
    return F.regexp_replace(
        F.regexp_replace(F.regexp_replace(c, r"\\", r"\\\\"), '"', r'\\"'),
        "\n", r"\\n",
    )


def _unescape(c):
    # escaped backslashes first (via sentinel) so the remaining \n / \"
    # sequences are genuine escapes — order matters for inputs like `a\"b`
    c = F.regexp_replace(c, r"\\\\", "\x00")
    c = F.regexp_replace(c, r"\\n", "\n")
    c = F.regexp_replace(c, r'\\"', '"')
    return F.regexp_replace(c, "\x00", r"\\")


def triples_to_ntriples(triples: DataFrame, object_is_uri: F.Column | None = None) -> DataFrame:
    """-> one-column DF of N-Triples ``line``s (K4).

    ``object_is_uri``: predicate Column deciding URI vs literal objects;
    defaults to o_datatype/o_lang being NULL and o looking like a URI/node.
    """
    o = F.col("o")
    # typed literals carry ^^<datatype> (mutually exclusive with @lang per
    # the RDF spec); frames without the column serialize as plain/tagged
    o_datatype = (
        F.col("o_datatype") if "o_datatype" in triples.columns
        else F.lit(None).cast("string")
    )
    if object_is_uri is None:
        object_is_uri = (
            F.col("o_lang").isNull()
            & o_datatype.isNull()
            & (o.startswith("http") | o.startswith("urn:") | o.contains(":") & ~o.contains(" "))
        )
    literal = F.concat(
        F.lit('"'), _escape(o), F.lit('"'),
        F.when(F.col("o_lang").isNotNull(), F.concat(F.lit("@"), F.col("o_lang")))
        .when(o_datatype.isNotNull(), F.concat(F.lit("^^<"), o_datatype, F.lit(">")))
        .otherwise(F.lit("")),
    )
    obj = F.when(object_is_uri, F.concat(F.lit("<"), o, F.lit(">"))).otherwise(literal)
    return triples.select(
        F.concat(
            F.lit("<"), F.col("s"), F.lit("> <"), F.col("p"), F.lit("> "), obj, F.lit(" .")
        ).alias("line")
    )


def ntriples_to_triples(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse N-Triples lines -> (s, p, o, o_lang, o_datatype); malformed or
    comment lines are dropped (the reference delegates strictness to
    rdflib; we keep the scan resilient)."""
    c = F.col(line_col)
    parsed = lines.select(
        F.regexp_extract(c, _NT_PATTERN, 1).alias("s"),
        F.regexp_extract(c, _NT_PATTERN, 2).alias("p"),
        F.regexp_extract(c, _NT_PATTERN, 3).alias("o_uri"),
        F.regexp_extract(c, _NT_PATTERN, 4).alias("o_lit"),
        F.regexp_extract(c, _NT_PATTERN, 5).alias("o_lang"),
        F.regexp_extract(c, _NT_PATTERN, 6).alias("o_datatype"),
    ).filter(F.col("s") != "")
    return parsed.select(
        "s",
        "p",
        F.when(F.col("o_uri") != "", F.col("o_uri")).otherwise(_unescape(F.col("o_lit"))).alias("o"),
        F.when(F.col("o_lang") != "", F.col("o_lang")).alias("o_lang"),
        F.when(F.col("o_datatype") != "", F.col("o_datatype")).alias("o_datatype"),
    )


def read_rdf_directory(spark: SparkSession, path: str, named_graph: str | None = None) -> DataFrame:
    """S9: load every .nt file under ``path`` into one triples DF; S10:
    optional constant named-graph column."""
    lines = spark.read.text(f"{path}")
    triples = ntriples_to_triples(lines.withColumnRenamed("value", "line"))
    return triples.withColumn("g", F.lit(named_graph))


def write_ntriples(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K4 sink: distributed text write (one shard per partition; cat-able)."""
    triples_to_ntriples(triples).write.mode(mode).text(path)


# Turtle local names may not contain these (PN_LOCAL subset we accept for
# bare prefixed names; anything else renders as an expanded <uri>)
_PNAME_RE = r"^[A-Za-z][A-Za-z0-9_-]*:[A-Za-z0-9_.-]+$"


def _turtle_uri_term(c: F.Column) -> F.Column:
    """Compact prefixed name when Turtle-safe and declared, else <uri>."""
    from prosnet_prefect_pipelines_spark.render import namespaces

    known = None
    for prefix in namespaces.PREFIXES:
        if prefix.startswith("urn:"):
            continue
        cond = c.startswith(prefix + ":")
        known = cond if known is None else (known | cond)
    pname_ok = c.rlike(_PNAME_RE) & known
    return F.when(pname_ok, c).otherwise(
        F.concat(F.lit("<"), namespaces.expand(c), F.lit(">"))
    )


def turtle_header() -> str:
    """@prefix block from the R11 namespace table
    (get_data_apis_vanilla.py:960-1047; serialize at
    get_data_from_apis_instance.py:97-102 — the reference's default
    output format is .ttl)."""
    from prosnet_prefect_pipelines_spark.render import namespaces

    return "\n".join(
        f"@prefix {p}: <{uri}> ."
        for p, uri in namespaces.PREFIXES.items()
        if not p.startswith("urn:")
    )


def triples_to_turtle_blocks(
    triples: DataFrame, object_is_uri: F.Column | None = None
) -> DataFrame:
    """-> one-column DF of subject-grouped Turtle ``block``s:

        <subject> p1 o1 ;
            p2 o2 .

    Pure Column expressions end-to-end: object rendering reuses the
    N-Triples literal logic, predicates/URIs compact to declared prefixed
    names when Turtle-safe; the per-subject block is one groupBy(s) +
    array_sort + aggregate fold — a single shuffle on the subject key,
    embarrassingly parallel at any scale. Deterministic: (p, o) pairs
    sorted within each block.
    """
    o = F.col("o")
    o_datatype = (
        F.col("o_datatype") if "o_datatype" in triples.columns
        else F.lit(None).cast("string")
    )
    if object_is_uri is None:
        object_is_uri = (
            F.col("o_lang").isNull()
            & o_datatype.isNull()
            & (o.startswith("http") | o.startswith("urn:") | o.contains(":") & ~o.contains(" "))
        )
    literal = F.concat(
        F.lit('"'), _escape(o), F.lit('"'),
        F.when(F.col("o_lang").isNotNull(), F.concat(F.lit("@"), F.col("o_lang")))
        .when(o_datatype.isNotNull(), F.concat(F.lit("^^"), _turtle_uri_term(o_datatype)))
        .otherwise(F.lit("")),
    )
    rendered = triples.select(
        _turtle_uri_term(F.col("s")).alias("subj"),
        F.concat(
            _turtle_uri_term(F.col("p")), F.lit(" "),
            F.when(object_is_uri, _turtle_uri_term(o)).otherwise(literal),
        ).alias("po"),
    )
    return (
        rendered.groupBy("subj")
        .agg(F.array_sort(F.collect_set("po")).alias("pos"))
        .select(
            F.concat(
                F.col("subj"), F.lit(" "),
                F.array_join(F.col("pos"), " ;\n    "),
                F.lit(" ."),
            ).alias("block")
        )
    )


def write_turtle(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K4 sink, reference-default format: distributed subject-grouped
    Turtle. Every output shard starts with the @prefix header (Turtle
    permits re-declaration), so shards are independently parseable AND
    their concatenation is one valid document. The header prepend is an
    Arrow-batched mapInPandas over whole partitions — no per-row Python.
    """
    from collections.abc import Iterator

    header = turtle_header()
    blocks = triples_to_turtle_blocks(triples)

    def add_header(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        first = True
        for pdf in it:
            if first and len(pdf):
                pdf = pd.concat(
                    [pd.DataFrame({"block": [header]}), pdf], ignore_index=True
                )
                first = False
            yield pdf

    blocks.mapInPandas(add_header, "block string").write.mode(mode).text(path)
