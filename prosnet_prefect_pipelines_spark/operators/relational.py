"""Relational operators over the canonical triples table (SURVEY §2.3).

The reference's relational semantics are SPARQL executed by remote engines
(Wikidata's Blazegraph) or pyoxigraph; here each construct is a DataFrame
composition over the triples schema (model.TRIPLE_SCHEMA):

- triple pattern  = filtered scan (predicate/constant pushdown -> parquet)
- shared variable = equi-join key
- OPTIONAL        = left outer join with the inner FILTER applied to the
                    right side *before* the join
- VALUES          = broadcast join against a literal DataFrame / isin
- SERVICE label   = per-language left joins + coalesce fallback

Scale notes (100 TB): a production triples table is stored partitioned /
bucketed by ``p`` (predicate) so pattern scans prune partitions, and the
per-pattern frames are small relative to the store. BGP joins shuffle on
the shared variable; Catalyst/AQE picks broadcast for selective patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def triple_pattern(
    triples: DataFrame,
    s: str,
    p: str,
    o: str,
    lang: str | None = None,
) -> DataFrame:
    """One SPARQL triple pattern as a filtered/projected scan.

    ``s``/``o`` starting with ``?`` are variables (become columns named
    after the variable); anything else is a constant filter. ``p`` must be
    constant (the reference queries never use predicate variables).
    ``lang`` filters the object language tag (F13 — langmatches, e.g.
    sparql/wikidata-person.sparql:20).
    """
    df = triples.filter(F.col("p") == p)
    cols: list[Column] = []
    if s.startswith("?"):
        cols.append(F.col("s").alias(s[1:]))
    else:
        df = df.filter(F.col("s") == s)
    if o.startswith("?"):
        cols.append(F.col("o").alias(o[1:]))
    else:
        df = df.filter(F.col("o") == o)
    if lang is not None:
        df = df.filter(F.col("o_lang") == lang)
    return df.select(*cols) if cols else df.select(F.lit(1).alias("_match"))


def bgp(triples: DataFrame, patterns: list[tuple]) -> DataFrame:
    """Basic graph pattern: inner-join triple patterns on shared variables.

    Spark twin of multi-pattern WHERE clauses (J1 —
    sparql/wikidata-person.sparql:7-10, wikidata-city.sparql:6-12).
    Patterns are (s, p, o) or (s, p, o, lang) tuples; join order is the
    textual order, Catalyst/AQE reorders physically.
    """
    out: DataFrame | None = None
    for pat in patterns:
        df = triple_pattern(triples, *pat)
        if out is None:
            out = df
        else:
            shared = [c for c in df.columns if c in out.columns]
            out = out.join(df, on=shared, how="inner") if shared else out.crossJoin(df)
    assert out is not None, "empty BGP"
    return out


def optional_join(
    left: DataFrame, right: DataFrame, on: list[str] | str
) -> DataFrame:
    """SPARQL OPTIONAL = left outer join (J2).

    Any FILTER scoped inside the OPTIONAL block must already be applied to
    ``right`` — it narrows the optional match, it does not drop left rows
    (sparql/wikidata-person.sparql:18-21 semantics).
    """
    return left.join(right, on=on, how="left")


def values_join(df: DataFrame, col: str, values: list) -> DataFrame:
    """SPARQL VALUES inline table (J4 — wikidata-organization.sparql:18-19).

    Collapses to ``isin`` (Catalyst InSet / broadcast) — never a shuffle.
    """
    return df.filter(F.col(col).isin(values))


def union_all(branches: list[DataFrame]) -> DataFrame:
    """SPARQL UNION is *bag* union (J3/O5); wrap with .distinct() only when
    the enclosing SELECT has DISTINCT (wikidata-organization.sparql:2-16)."""
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def label_service_join(
    entities: DataFrame,
    triples: DataFrame,
    entity_col: str,
    label_predicate: str = "ex:label",
    langs: tuple[str, ...] = ("de", "en"),
    out_col: str = "label",
) -> DataFrame:
    """Wikidata label-service emulation (J6): per-language left joins with
    first-non-null fallback in ``langs`` order.

    Reference: SERVICE wikibase:label { ... language "de,en" }
    (sparql/wikidata-person.sparql:22). Label frames are predicate-filtered
    scans — small relative to the store — so they broadcast.
    """
    out = entities
    lang_cols = []
    labels = triples.filter(F.col("p") == label_predicate)
    for lang in langs:
        col_name = f"_label_{lang}"
        lang_df = (
            labels.filter(F.col("o_lang") == lang)
            .select(F.col("s").alias(entity_col), F.col("o").alias(col_name))
        )
        out = out.join(F.broadcast(lang_df), on=entity_col, how="left")
        lang_cols.append(col_name)
    return out.withColumn(out_col, F.coalesce(*[F.col(c) for c in lang_cols])).drop(*lang_cols)


def exists_anti_join(candidates: DataFrame, seen: DataFrame, on: list[str] | str) -> DataFrame:
    """`(uri, None, None) not in g` existence guard (J7) as a left_anti join.

    Reference: pfp-prefect-pipelines/get_data_apis_vanilla.py:524-525 and
    the worklist accumulation at :155-162 — dedup-before-recompute.
    """
    return candidates.join(seen, on=on, how="left_anti")


def drop_url_templates(df: DataFrame, col: str) -> DataFrame:
    """P6: drop rows whose route/URL still contains a `{param}` template
    placeholder — the swagger-route filter at
    prosnet-prefect-pipelines/get_data_from_apis_instance.py:185.
    Pure narrow filter; pushes to the scan.
    """
    return df.filter(~F.col(col).contains("{"))


def paginate(df: DataFrame, order_by: list[str], offset: int, limit: int) -> DataFrame:
    """LIMIT/OFFSET window over a stable sort key (O2).

    The reference paginates remote SPARQL with ORDER BY ?item + LIMIT/OFFSET
    (sparql/wikidata-person.sparql:14-16); in-engine pagination only exists
    to reproduce that behavior bit-for-bit — full scans need no pages.
    Global row_number implies a single-partition sort of the key columns;
    acceptable because pagination is a test/compat surface, not a scale path.
    """
    from pyspark.sql.window import Window

    w = Window.orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") > offset) & (F.col("_rn") <= offset + limit))
        .drop("_rn")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``salt`` buckets.

    For skewed key distributions AQE's skew-join splitting can't fix
    (e.g. one key holding >1 executor-memory of rows on BOTH sides is
    impossible to split; one-sided skew with a non-splittable stage is
    merely slow): salt the skewed (left) side with a random bucket and
    replicate the right side across all buckets. Shuffle keys become
    (key, bucket) — hot keys fan out over ``salt`` reducers.

    Replication multiplies the right side by ``salt``; use only when the
    right side is modest and the left is skewed. With AQE on, prefer
    letting AQE split first and reach for salting when `.explain` still
    shows a straggler partition.
    """
    l = left.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l.join(r, on=[on, "_salt"], how=how).drop("_salt")


def salted_count(df: DataFrame, key: str, salt: int = 16) -> DataFrame:
    """Two-phase count per key: pre-aggregate on (key, random salt), then
    combine — caps any single reducer's input at ~|key rows|/salt even
    under extreme key skew. (Spark's hash aggregate already partial-aggs
    map-side; explicit salting helps when upstream partitioning is
    pathological, e.g. after a skewed join.)"""
    return (
        df.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(key)
        .agg(F.sum("_c").alias("n"))
    )
