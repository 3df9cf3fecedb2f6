"""Registry & tooling guards (r7, closing the r6 ADVICE items).

1. plans/catalog.register must refuse EVERY true duplicate-name
   registration — cross-module, same-module different function, and the
   previously-open hole: the same module defining the same function
   NAME twice (identical qualname, so only the source line
   distinguishes it from a reload) — while an idempotent re-register of
   the very same code stays silent.
2. scripts/check_correctness.module_refs must see every import form the
   --touched sweep depends on (the r5 advice found a line-regex
   predecessor missing parenthesized multi-line lists).

No SparkSession needed; these are pure-Python.
"""

from __future__ import annotations

import pytest

from prosnet_prefect_pipelines_spark.plans import catalog


def _fake_fn(name: str, module: str, line_pad: int):
    """A function object compiled at a controlled source line, so two
    same-named definitions get distinct co_firstlineno — exactly what a
    real duplicate definition inside one module looks like."""
    src = "\n" * line_pad + f"def {name}(spark, sf_dir):\n    return None\n"
    ns: dict = {}
    exec(compile(src, f"{module}.py", "exec"), ns)
    fn = ns[name]
    fn.__module__ = module
    return fn


def _cleanup(qname: str):
    for tbl in (catalog.QUERIES, catalog.ORACLES, catalog.COVERAGE,
                catalog.MODULES, catalog._QUALNAMES, catalog._LINES):
        tbl.pop(qname, None)


def test_register_rejects_cross_module_duplicate():
    qname = "_t_dup_cross"
    try:
        catalog.register(qname)(_fake_fn("q_a", "fake_mod_one", 0))
        with pytest.raises(ValueError, match="duplicate query name"):
            catalog.register(qname)(_fake_fn("q_a", "fake_mod_two", 0))
    finally:
        _cleanup(qname)


def test_register_rejects_same_module_same_name_shadowing():
    """The r6-advice hole: module defines `def q_x` twice — same module,
    same qualname; only co_firstlineno differs."""
    qname = "_t_dup_shadow"
    try:
        catalog.register(qname)(_fake_fn("q_x", "fake_mod_shadow", 0))
        with pytest.raises(ValueError, match="duplicate query name"):
            catalog.register(qname)(_fake_fn("q_x", "fake_mod_shadow", 7))
    finally:
        _cleanup(qname)


def test_register_idempotent_on_reload():
    """Re-running registration for the SAME code (module reload) must
    not raise: identical module, qualname, and firstlineno."""
    qname = "_t_dup_reload"
    try:
        fn = _fake_fn("q_r", "fake_mod_reload", 3)
        catalog.register(qname)(fn)
        catalog.register(qname)(fn)  # reload: same identity triple
        # and a recompile of identical source hits the same lineno
        catalog.register(qname)(_fake_fn("q_r", "fake_mod_reload", 3))
    finally:
        _cleanup(qname)


def test_module_refs_sees_all_import_forms():
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from check_correctness import module_refs

    pkg = "prosnet_prefect_pipelines_spark"
    known = {"dedup", "similarity", "graph", "scalar", "catalog", "session"}
    text = f"""
import {pkg}.operators.dedup
import {pkg}.operators.similarity as sim
from {pkg}.operators import (
    graph,
    dedup,
)
from {pkg}.functions.scalar import something
from . import session
from .plans import catalog
import numpy as np
from collections import Counter
"""
    refs = module_refs(text, known, pkg)
    assert refs == {"dedup", "similarity", "graph", "scalar", "session",
                    "catalog"}
    # third-party imports never leak in
    assert module_refs("import numpy\nfrom pandas import DataFrame",
                       known, pkg) == set()
