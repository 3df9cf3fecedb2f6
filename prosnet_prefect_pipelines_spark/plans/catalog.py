"""Driver-facing query catalog: name -> (Spark callable, DuckDB oracle SQL).

Every operator claimed in SURVEY §2 registers here; ``__spark_entry__.py``
re-exports QUERIES/ORACLES. Conventions (driver contract):

- callable signature ``(spark, sf_dir) -> DataFrame``
- every computed column aliased identically in Spark and SQL
- float aggregates computed over DECIMAL (exact, order-independent) and
  cast to DOUBLE at the end, so both engines produce bit-identical values
- timestamps never returned raw — always formatted to strings (UTC)
- plan construction is job-free by default: a catalog callable should
  only BUILD the DataFrame. The documented exceptions run bounded
  Spark jobs at construction (eager index checkpoints in the ANN/PQ
  plans; distrank's EAGER wrappers ``global_prefix_sums``/
  ``global_row_number``/``global_rank_prefix_sum`` when downstream
  arithmetic needs driver-side ints) — each is flagged in its
  docstring; the lazy ``prefix_sums``/``with_global_ntile`` forms are
  the default for new work
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
# SURVEY §2 operator ids covered by each query (for COVERAGE.md / the judge)
COVERAGE: dict[str, list[str]] = {}
# defining module of each query (for the git-diff touched-queries sweep)
MODULES: dict[str, str] = {}
# defining function qualname — distinguishes two same-named @register
# calls INSIDE one module (r5 advice: the module-only guard let those
# silently overwrite) from an idempotent module re-import
_QUALNAMES: dict[str, str] = {}
# defining line — catches the remaining hole (r6 advice): two functions
# with the SAME name defined twice in one module share module AND
# qualname, so only the source position tells a true duplicate from a
# reload of identical code
_LINES: dict[str, int] = {}


def register(name: str, oracle: str | None = None, covers: list[str] | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # the driver hands us its own session; pin the runtime conf the
            # engine relies on (UTC, nanos handling, codegen policy)
            from prosnet_prefect_pipelines_spark.session import pin_session_conf

            pin_session_conf(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in QUERIES and (
            MODULES.get(name) != fn.__module__
            or _QUALNAMES.get(name) != fn.__qualname__
            or _LINES.get(name) != fn.__code__.co_firstlineno
        ):
            # a silent overwrite drops a query (and its oracle pairing)
            # from the catalog — caught live in r5 when a new batch
            # reused `gini_concentration` from q_pipeline19. Comparing
            # (module, qualname, lineno) instead of module alone also
            # catches two same-named @register calls inside ONE module
            # (r5/r6 advice) even when the shadowing function reuses the
            # same function name (identical qualname), while an
            # importlib-reload of the same code stays idempotent.
            raise ValueError(
                f"duplicate query name {name!r}: already registered by "
                f"{MODULES[name]}.{_QUALNAMES.get(name)}:{_LINES.get(name)}, "
                f"re-registered by {fn.__module__}.{fn.__qualname__}:"
                f"{fn.__code__.co_firstlineno}"
            )
        QUERIES[name] = wrapped
        _QUALNAMES[name] = fn.__qualname__
        _LINES[name] = fn.__code__.co_firstlineno
        if oracle is not None:
            ORACLES[name] = oracle
        COVERAGE[name] = covers or []
        MODULES[name] = fn.__module__
        return wrapped

    return deco


def _load_all() -> None:
    """Import every query module so registration side effects run."""
    from prosnet_prefect_pipelines_spark.plans import (  # noqa: F401
        q_aggregates,
        q_curation,
        q_dedup,
        q_flagship,
        q_functions,
        q_graph,
        q_index,
        q_pipeline2,
        q_pipeline3,
        q_pipeline4,
        q_pipeline5,
        q_pipeline6,
        q_pipeline7,
        q_pipeline8,
        q_pipeline9,
        q_pipeline10,
        q_pipeline11,
        q_pipeline12,
        q_pipeline13,
        q_pipeline14,
        q_pipeline15,
        q_pipeline16,
        q_pipeline17,
        q_pipeline18,
        q_pipeline19,
        q_pipeline20,
        q_pipeline21,
        q_pipeline22,
        q_pipeline23,
        q_pipeline24,
        q_pipeline25,
        q_pipeline26,
        q_pipeline27,
        q_pipeline28,
        q_pipeline29,
        q_pipeline30,
        q_pipeline31,
        q_pipeline32,
        q_pipeline33,
        q_pipeline34,
        q_pipeline35,
        q_pipeline36,
        q_pipeline37,
        q_pipeline38,
        q_pipeline39,
        q_pipeline40,
        q_pipeline41,
        q_pipeline42,
        q_pipeline43,
        q_pipeline44,
        q_pipeline45,
        q_pipeline46,
        q_pipeline47,
        q_pipeline48,
        q_pipeline49,
        q_pipeline50,
        q_pipeline51,
        q_pipeline52,
        q_pipeline53,
        q_pipeline54,
        q_pipeline55,
        q_pipeline56,
        q_pipeline57,
        q_pipeline58,
        q_pipeline59,
        q_pipeline60,
        q_pipeline61,
        q_pipeline62,
        q_pipeline63,
        q_pipeline64,
        q_pipeline65,
        q_pipeline66,
        q_pipeline67,
        q_pipeline68,
        q_pipeline69,
        q_pipeline70,
        q_pipeline71,
        q_pipeline72,
        q_pipeline73,
        q_pipeline74,
        q_pipeline75,
        q_pipeline76,
        q_pipeline77,
        q_pipeline78,
        q_pipeline79,
        q_pipeline80,
        q_pipeline81,
        q_pipeline82,
        q_pipeline83,
        q_pipeline84,
        q_pipeline85,
        q_pipeline86,
        q_pipeline87,
        q_pipeline88,
        q_pipeline89,
        q_pipeline90,
        q_pipeline91,
        q_pipeline92,
        q_pipeline93,
        q_pipeline94,
        q_pipeline95,
        q_pipeline96,
        q_pipeline97,
        q_pipeline98,
        q_pipeline99,
        q_pipeline100,
        q_pipeline101,
        q_pipeline102,
        q_pipeline103,
        q_pipeline104,
        q_pipeline105,
        q_pipeline106,
        q_pipeline107,
        q_pipeline108,
        q_pipeline109,
        q_pipeline110,
        q_pipeline111,
        q_pipeline112,
        q_pipeline113,
        q_pipeline114,
        q_pipeline115,
        q_pipeline116,
        q_pipeline117,
        q_pipeline118,
        q_ranking,
        q_relational,
        q_render,
        q_render2,
        q_render3,
        q_similarity,
        q_sinks,
        q_sources,
        q_stream,
        q_streaming,
        q_temporal,
        q_text,
    )


_LOADED = False


def load() -> tuple[dict, dict]:
    global _LOADED
    if not _LOADED:
        _load_all()
        _LOADED = True
    return QUERIES, ORACLES
