"""Property-based check of the OData $filter grammar (hypothesis):
random and/or-combined terms over a small typed table must filter a
DataFrame exactly like the same predicate evaluated row-by-row in Python.

Complements the example-based grammar tests in test_rest_source — the
generator covers operator/precedence/quoting combinations nobody writes by
hand (OData 'and' binds tighter than 'or'; quoted strings may contain the
words 'and'/'or' or parens, which the splitter must not treat as syntax).
r4 extends the grammar (VERDICT item 5): startswith/endswith/contains,
in-lists, not, parenthesized groups, and '' quote escaping.
"""

from __future__ import annotations

import operator

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from msgraphdatapipelines_spark.sources.rest import _odata_filter_to_column

ROWS = [
    {"name": "alpha", "os": "Windows", "count": 1, "score": -2.5},
    {"name": "bravo and charlie", "os": "Linux", "count": 7, "score": 0.0},
    {"name": "delta or echo", "os": "Windows", "count": 3, "score": 4.25},
    {"name": "", "os": "macOS", "count": 0, "score": 9.75},
    {"name": "the 'x' (q)", "os": "Linux", "count": 12, "score": -7.0},
]

_PYOPS = {
    "eq": operator.eq,
    "ne": operator.ne,
    "gt": operator.gt,
    "ge": operator.ge,
    "lt": operator.lt,
    "le": operator.le,
}

_STR_VALS = [
    "Windows",
    "Linux",
    "alpha",
    "bravo and charlie",
    "delta or echo",
    "",
    "the 'x' (q)",
    "al",
    "pha",
]
_NUM_COLS = {"count": [0, 1, 3, 7, 12], "score": [-7.0, -2.5, 0.0, 4.25, 9.75]}


def _quote(v: str) -> str:
    """OData string literal: quotes escape by doubling."""
    return "'" + v.replace("'", "''") + "'"


@st.composite
def comparisons(draw):
    op = draw(st.sampled_from(list(_PYOPS)))
    kind = draw(st.sampled_from(["str", "int", "float"]))
    if kind == "str":
        col = draw(st.sampled_from(["name", "os"]))
        val = draw(st.sampled_from(_STR_VALS))
        pyop = _PYOPS[op]
        return f"{col} {op} {_quote(val)}", (lambda r, c=col, o=pyop, v=val: o(r[c], v))
    col = draw(st.sampled_from(list(_NUM_COLS)))
    val = draw(st.sampled_from(_NUM_COLS[col]))
    if col == "count" and isinstance(val, float):
        val = int(val)
    pyop = _PYOPS[op]
    return f"{col} {op} {val}", (lambda r, c=col, o=pyop, v=val: o(r[c], v))


@st.composite
def str_functions(draw):
    fn = draw(st.sampled_from(["startswith", "endswith", "contains"]))
    col = draw(st.sampled_from(["name", "os"]))
    val = draw(st.sampled_from(_STR_VALS))
    py = {
        "startswith": lambda s, v: s.startswith(v),
        "endswith": lambda s, v: s.endswith(v),
        "contains": lambda s, v: v in s,
    }[fn]
    return f"{fn}({col}, {_quote(val)})", (lambda r, c=col, p=py, v=val: p(r[c], v))


@st.composite
def in_lists(draw):
    kind = draw(st.sampled_from(["str", "int"]))
    if kind == "str":
        col = draw(st.sampled_from(["name", "os"]))
        vals = draw(st.lists(st.sampled_from(_STR_VALS), min_size=1, max_size=3))
        lits = ", ".join(_quote(v) for v in vals)
    else:
        col = "count"
        vals = draw(st.lists(st.sampled_from(_NUM_COLS["count"]), min_size=1, max_size=3))
        lits = ", ".join(str(v) for v in vals)
    return f"{col} in ({lits})", (lambda r, c=col, vs=tuple(vals): r[c] in vs)


@st.composite
def terms(draw):
    expr, pred = draw(st.one_of(comparisons(), str_functions(), in_lists()))
    if draw(st.booleans()):  # negate ~half the terms
        grouped = draw(st.booleans())
        expr = f"not ({expr})" if grouped else f"not {expr}"
        return expr, (lambda r, p=pred: not p(r))
    return expr, pred


@st.composite
def filters(draw):
    """OR of ANDs — the grammar's precedence shape, 1-3 × 1-3 terms."""
    groups = draw(st.lists(st.lists(terms(), min_size=1, max_size=3), min_size=1, max_size=3))
    expr = " or ".join(" and ".join(c[0] for c in grp) for grp in groups)
    preds = [[c[1] for c in grp] for grp in groups]
    return expr, preds


def _py_eval(preds, row) -> bool:
    return any(all(p(row) for p in grp) for grp in preds)


@settings(max_examples=80, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(filters())
def test_odata_filter_matches_python_semantics(spark_rows_df, case):
    spark, df = spark_rows_df
    expr, preds = case
    got = sorted(r["name"] for r in df.filter(_odata_filter_to_column(expr)).collect())
    want = sorted(r["name"] for r in ROWS if _py_eval(preds, r))
    assert got == want, f"filter {expr!r}: spark={got} python={want}"


def test_grouped_or_inside_and(spark_rows_df):
    """Parenthesized or-group under an and — the precedence inversion the
    flat subset grammar couldn't express before r4."""
    spark, df = spark_rows_df
    expr = "(os eq 'Windows' or os eq 'Linux') and count ge 3"
    got = sorted(r["name"] for r in df.filter(_odata_filter_to_column(expr)).collect())
    want = sorted(
        r["name"] for r in ROWS if (r["os"] in ("Windows", "Linux")) and r["count"] >= 3
    )
    assert got == want and len(got) == 3


import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_rows_df(spark):
    df = spark.createDataFrame(
        [(r["name"], r["os"], r["count"], r["score"]) for r in ROWS],
        "name string, os string, count long, score double",
    )
    df = df.cache()
    df.count()
    return spark, df
