"""Property tests: scalar Column expressions vs the reference's own Python.

The reference functions (wikidata_index.py:15-126) are dependency-free;
we extract exactly those defs from the source via AST and execute them
in-memory as behavioral oracles on generated inputs (SURVEY §5 item 3).
No reference code is copied into the repo — it is loaded read-only at
test time.
"""

from __future__ import annotations

import ast
import random

import pytest
from pyspark.sql import functions as F

from prosnet_prefect_pipelines_spark.functions import scalar

REF_PATH = "/root/reference/prosnet-prefect-pipelines/wikidata_index.py"
REF_FUNCS = [
    "date_postprocessing",
    "cocatenated_dates_postprocessing",
    "label_creator_person",
    "label_creator_place",
    "label_creator_organization",
    "geopoint_creator",
    "feature_code_postprocessing",
]


@pytest.fixture(scope="module")
def ref():
    tree = ast.parse(open(REF_PATH).read())
    wanted = [n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name in REF_FUNCS]
    mod = ast.Module(body=wanted, type_ignores=[])
    ns: dict = {}
    exec(compile(mod, REF_PATH, "exec"), ns)  # noqa: S102 — test oracle only
    return ns


rng = random.Random(42)


def _dates(n):
    out = []
    for _ in range(n):
        kind = rng.randrange(4)
        if kind == 0:
            out.append("http://www.wikidata.org/.well-known/genid/%032x" % rng.getrandbits(128))
        elif kind == 1:
            out.append(f"{rng.randrange(1000, 2100)}-{rng.randrange(1, 13):02d}-"
                       f"{rng.randrange(1, 29):02d}T00:00:00Z")
        elif kind == 2:
            out.append(f"{rng.randrange(1000, 2100)}-{rng.randrange(1, 13):02d}-"
                       f"{rng.randrange(1, 29):02d}")
        else:
            out.append(str(rng.randrange(1000, 2100)))
    return out


def _compare(spark, inputs, ref_fn, col_fn, schema="v string"):
    """Batch-compare: reference python per row vs one Spark select."""
    rows = [(v,) for v in inputs]
    df = spark.createDataFrame(rows, schema)
    got = [r.out for r in df.select(col_fn(F.col("v")).alias("out")).collect()]
    want = [ref_fn(v) for v in inputs]
    assert got == want


def test_date_postprocessing(spark, ref):
    _compare(spark, _dates(200), ref["date_postprocessing"], scalar.date_postprocessing)


def test_cocatenated_dates(spark, ref):
    # reference crashes on sentinel elements (None in join) — generate clean
    vals = [" ".join(d for d in _dates(rng.randrange(1, 4)) if not d.startswith("http"))
            for _ in range(150)]
    vals = [v for v in vals if v]
    _compare(spark, vals, ref["cocatenated_dates_postprocessing"],
             scalar.cocatenated_dates_postprocessing)


def test_geopoint_creator(spark, ref):
    vals = []
    for _ in range(200):
        if rng.random() < 0.3:
            vals.append("http://www.wikidata.org/.well-known/genid/x")
        else:
            lng = round(rng.uniform(-180, 180), rng.randrange(1, 7))
            lat = round(rng.uniform(-90, 90), rng.randrange(1, 7))
            vals.append(f"Point({lng} {lat})")
    rows = [(v,) for v in vals]
    df = spark.createDataFrame(rows, "v string")
    got = [r.out for r in df.select(scalar.geopoint_creator(F.col("v")).alias("out")).collect()]
    want = [ref["geopoint_creator"](v) for v in vals]
    assert got == want


def test_feature_code_postprocessing(spark, ref):
    ranks = scalar.FEATURE_CODES_RANK
    vals = []
    for _ in range(300):
        n = rng.randrange(0, 5)
        toks = []
        for _ in range(n):
            kind = rng.randrange(4)
            if kind == 0:
                toks.append("P." + rng.choice(ranks))
            elif kind == 1:
                toks.append("A." + rng.choice(ranks))
            elif kind == 2:
                toks.append(rng.choice(["P.ZZZ", "A.QQQ", "P.FOO1"]))  # unranked P/A
            else:
                toks.append(rng.choice(["X.Y", "FOO", "GB"]))  # non-P/A
        vals.append(" ".join(toks))
    vals = [v for v in vals if v]  # empty string: ref returns None via len(codes)>0? ''.split() == []
    vals.append("P.PPLC A.ADM1")
    vals.append("FOO BAR")
    _compare(spark, vals, ref["feature_code_postprocessing"], scalar.feature_code_postprocessing)


def _maybe(v):
    """Model SPARQL OPTIONAL: absent key, present-None, or value."""
    r = rng.random()
    if r < 0.25:
        return ("absent", None)
    if r < 0.4:
        return ("none", None)
    return ("value", v)


def test_label_creator_person(spark, ref):
    cases = []
    for i in range(250):
        name = f"Person {i}"
        dob = _maybe(rng.choice(_dates(1)))
        dod = _maybe(rng.choice(_dates(1)))
        desc = _maybe(f"desc {i}")
        cases.append((name, dob, dod, desc))
    want, rows = [], []
    for name, dob, dod, desc in cases:
        data = {"name": name}
        for key, (state, v) in [("date_of_birth", dob), ("date_of_death", dod), ("description", desc)]:
            if state != "absent":
                data[key] = v
        want.append(ref["label_creator_person"](data))
        rows.append((
            name,
            dob[1] if dob[0] == "value" else None,
            dod[1] if dod[0] == "value" else None,
            desc[1] if desc[0] == "value" else None,
            dob[0] != "absent",
            dod[0] != "absent",
        ))
    df = spark.createDataFrame(
        rows, "name string, dob string, dod string, descr string, dob_bound boolean, dod_bound boolean"
    )
    got = [
        r.out
        for r in df.select(
            scalar.label_creator_person(
                F.col("name"), F.col("dob"), F.col("dod"), F.col("descr"),
                dob_bound=F.col("dob_bound"), dod_bound=F.col("dod_bound"),
            ).alias("out")
        ).collect()
    ]
    assert got == want


def test_label_creator_place(spark, ref):
    want, rows = [], []
    for i in range(200):
        name = f"Place {i}"
        country = _maybe(f"Country {i % 7}")
        fc = _maybe(rng.choice(scalar.FEATURE_CODES_RANK))
        data = {"name": name}
        if country[0] != "absent":
            data["country"] = country[1]
        if fc[0] != "absent":
            data["feature_code"] = fc[1]
        want.append(ref["label_creator_place"](data))
        rows.append((name, country[1], fc[1]))
    df = spark.createDataFrame(rows, "name string, country string, fc string")
    got = [
        r.out
        for r in df.select(
            scalar.label_creator_place(F.col("name"), F.col("country"), F.col("fc")).alias("out")
        ).collect()
    ]
    assert got == want


def test_label_creator_organization(spark, ref):
    want, rows = [], []
    for i in range(250):
        name = f"Org {i}" + (" (reg)" if rng.random() < 0.2 else "")
        incep = _maybe(rng.choice(["1950", "1950-01-01", "195", "2001-12-31"]))
        diss = _maybe(rng.choice(["2001", "2001-12-31", "20", "1999-06-30"]))
        desc = _maybe(f"d{i}")
        data = {"name": name}
        if incep[0] != "absent":
            data["inception"] = incep[1]
        if diss[0] != "absent":
            data["dissolvement"] = diss[1]
        if desc[0] != "absent":
            data["description"] = desc[1]
        want.append(ref["label_creator_organization"](data))
        rows.append((name, incep[1], diss[1], desc[1]))
    df = spark.createDataFrame(rows, "name string, incep string, diss string, descr string")
    got = [
        r.out
        for r in df.select(
            scalar.label_creator_organization(
                F.col("name"), F.col("incep"), F.col("diss"), F.col("descr")
            ).alias("out")
        ).collect()
    ]
    assert got == want
