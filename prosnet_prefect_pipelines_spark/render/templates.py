"""Triple-template machinery: one entity row -> N conditional triples.

The reference's render_* functions (SURVEY §2.8, R1-R10;
pfp-prefect-pipelines/get_data_apis_vanilla.py:115-895) each emit 5-40
``g.add(...)`` calls per entity, guarded by null checks. Spark shape: build
an array of conditional (s, p, o, o_lang) structs per row, drop the NULLs,
explode — a single narrow pass over the entity DataFrame, fully parallel,
no UDFs.

rdflib ``Graph.add`` has set semantics (duplicate triples collapse), so
renderers end with ``.distinct()`` to match observable output.

Scale: explode multiplies rows ~20-40x but stays pipelined inside
whole-stage codegen; the only shuffle is the final distinct, which a real
deployment partitions by subject (``s``) so downstream per-subject
operations reuse the partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Template:
    """One conditional triple: emitted when ``cond`` is true (None = always)."""

    s: Column
    p: Column | str
    o: Column
    lang: Column | str | None = None
    cond: Column | None = None
    datatype: str | None = None  # e.g. geo:wktLiteral (R10 space primitives)


def _lit_or_col(v, default=None) -> Column:
    if v is None:
        return F.lit(default).cast("string")
    return F.lit(v) if isinstance(v, str) else v


def _struct(t: Template, include_datatype: bool) -> Column:
    p = F.lit(t.p) if isinstance(t.p, str) else t.p
    fields = [t.s.alias("s"), p.alias("p"), t.o.alias("o"), _lit_or_col(t.lang).alias("o_lang")]
    if include_datatype:
        fields.append(_lit_or_col(t.datatype).alias("o_datatype"))
    st = F.struct(*fields)
    if t.cond is not None:
        st = F.when(t.cond, st)
    # a NULL s or o also suppresses the triple (rdflib would crash on None;
    # the reference guards every such case — cond is the explicit guard)
    return F.when(t.s.isNotNull() & t.o.isNotNull(), st) if t.cond is None else st


def template_arrays(
    templates: list[Template],
    chunk_size: int = 12,
    include_datatype: bool = False,
) -> list[Column]:
    """Build the per-chunk conditional-struct array Columns for ``templates``.

    Split out from :func:`explode_templates` so renderers can build these
    Column trees ONCE per SparkContext and reuse them across calls: the
    trees are pure unresolved expressions over field names (no data, no
    plan state), but constructing 40+ of them costs thousands of py4j
    round trips — measured ~1.6 s of driver time per render_person call
    at any scale (opt r11, guide §1.2 step 2: per-call work).
    """
    arrs = []
    for i in range(0, len(templates), chunk_size):
        chunk = templates[i : i + chunk_size]
        arrs.append(F.array_compact(F.array(*[_struct(t, include_datatype) for t in chunk])))
    return arrs


def prepare_templates(
    templates: list[Template],
    chunk_size: int = 12,
    include_datatype: bool = False,
) -> dict:
    """Fully prebuild the reusable Column trees for a template set:
    per-chunk ``explode(...)`` columns plus the output projection.
    Everything returned is static and session-reusable — callers cache
    the result per SparkContext and apply it with
    :func:`explode_prepared` (zero template-construction py4j traffic
    per call)."""
    cols = ["s", "p", "o", "o_lang"] + (["o_datatype"] if include_datatype else [])
    arrs = template_arrays(templates, chunk_size, include_datatype)
    return {
        "explodes": [F.explode(arr).alias("t") for arr in arrs],
        "proj": [F.col(f"t.{c}").alias(c) for c in cols],
    }


def explode_prepared(df: DataFrame, prep: dict) -> DataFrame:
    """Apply a :func:`prepare_templates` bundle to ``df``."""
    outs = [df.select(e).select(*prep["proj"]) for e in prep["explodes"]]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def explode_arrays(
    df: DataFrame, arrs: list[Column], include_datatype: bool = False
) -> DataFrame:
    """Explode prebuilt template arrays (:func:`template_arrays`) into
    (s, p, o, o_lang[, o_datatype]) rows, one union branch per chunk."""
    cols = ["s", "p", "o", "o_lang"] + (["o_datatype"] if include_datatype else [])
    outs = [
        df.select(F.explode(arr).alias("t")).select(
            *[F.col(f"t.{c}").alias(c) for c in cols]
        )
        for arr in arrs
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def explode_templates(
    df: DataFrame,
    templates: list[Template],
    chunk_size: int = 12,
    include_datatype: bool = False,
) -> DataFrame:
    """Apply all templates -> (s, p, o, o_lang[, o_datatype]) rows.

    Templates are applied in chunks of ``chunk_size`` per explode, unioned:
    one mega-expression for 40+ templates generates a method too large to
    JIT (and too slow interpreted — observed 70s for 15k entities at
    sf0.1 vs ~8s chunked). The input should be (local)checkpointed or
    cached by the caller when chunks > 1 so each union branch reads the
    materialized frame, not a recomputed lineage.
    """
    return explode_arrays(
        df, template_arrays(templates, chunk_size, include_datatype), include_datatype
    )


def node(prefix: str, *parts: Column | str) -> Column:
    """URI minting helper: ``prefix`` + parts concatenated.

    Mirrors the reference's ``idmapis[f"personproxy.{id}"]`` pattern.
    """
    cols = [F.lit(prefix)]
    for p in parts:
        cols.append(F.lit(p) if isinstance(p, str) else p.cast("string"))
    return F.concat(*cols)
