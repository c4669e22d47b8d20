"""REST/OData source tests (S1-S5, P1-P2) on local fixture pages —
the engine analog of FIXTURES.md §B.b3."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from msgraphdatapipelines_spark.sources import rest

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("operatingSystem", T.StringType()),
        T.StructField("osVersion", T.StringType()),
        T.StructField("errorCode", T.LongType()),
    ]
)


@pytest.fixture()
def pages(tmp_path):
    """Three chained pages; last page has no nextLink (S2 golden)."""
    recs = [
        {"id": f"r{i}", "operatingSystem": "Windows" if i % 2 == 0 else "macOS",
         "osVersion": f"10.{i}", "errorCode": i}
        for i in range(9)
    ]
    paths = [tmp_path / f"page{i}.json" for i in range(3)]
    for i, p in enumerate(paths):
        body = {"value": recs[i * 3 : (i + 1) * 3]}
        if i < 2:
            body["@odata.nextLink"] = str(paths[i + 1])
        p.write_text(json.dumps(body))
    return str(paths[0]), recs


def test_pagination_union(spark, pages):
    first, recs = pages
    df = rest.read_odata(spark, first, SCHEMA)
    assert sorted(r["id"] for r in df.collect()) == sorted(r["id"] for r in recs)


def test_select_and_filter_pushdown(spark, pages):
    first, _ = pages
    df = rest.read_odata(
        spark,
        first,
        SCHEMA,
        select=["id", "operatingSystem"],
        filter_expr="operatingSystem eq 'Windows'",
    )
    rows = df.collect()
    assert df.columns == ["id", "operatingSystem"]
    assert rows and all(r["operatingSystem"] == "Windows" for r in rows)


def test_429_retry_succeeds_within_budget(pages):
    first, recs = pages
    attempts = {"n": 0}
    sleeps: list[float] = []

    def flaky(url: str) -> str:
        if url == first:
            attempts["n"] += 1
            if attempts["n"] <= 2:  # 429 twice, then succeed (FIXTURES §B.b3)
                raise rest.ThrottledError(url)
        return rest.file_fetcher(url)

    bodies = rest.fetch_pages(
        first, fetcher=flaky, retry=rest.RetryPolicy(max_retries=5, sleep_s=30), sleeper=sleeps.append
    )
    assert len(bodies) == 3
    assert sleeps == [30, 30]  # reference: constant 30 s sleeps


def test_429_budget_exhausted_raises():
    def always_throttled(url: str) -> str:
        raise rest.ThrottledError(url)

    with pytest.raises(rest.ThrottledError):
        rest.fetch_pages(
            "x", fetcher=always_throttled, retry=rest.RetryPolicy(max_retries=2, sleep_s=0), sleeper=lambda s: None
        )


def test_entity_failure_isolation(spark, pages):
    """S5 — one failing endpoint doesn't abort the run (`Export…ps1:204-208`)."""
    from msgraphdatapipelines_spark.pipelines import Pipeline, run_all

    first, _ = pages

    def bad_source(s):
        raise rest.ThrottledError("endpoint down")

    results = run_all(
        spark,
        [
            Pipeline("bad", bad_source),
            Pipeline("good", lambda s: rest.read_odata(s, first, SCHEMA)),
        ],
    )
    assert [r.ok for r in results] == [False, True]
    assert results[1].rows == 9


def test_odata_filter_grammar(spark, pages):
    first, _ = pages
    df = rest.read_odata(
        spark, first, SCHEMA,
        filter_expr="errorCode gt 3 and operatingSystem eq 'Windows' or errorCode le 1",
    )
    ids = sorted(r["errorCode"] for r in df.collect())
    # (ec>3 and os='Windows') or ec<=1  → ec in {0,1} ∪ {4,6,8}
    assert ids == [0, 1, 4, 6, 8]


def test_python_datasource_reads_pages(spark, pages):
    first, recs = pages
    if not rest.register_odata_source(spark):
        pytest.skip("Python DataSource API unavailable")
    df = (
        spark.read.format("odata")
        .schema(SCHEMA)
        .option("path", first)
        .option("select", "id,operatingSystem,osVersion,errorCode")
        .load()
    )
    assert sorted(r["id"] for r in df.collect()) == sorted(r["id"] for r in recs)
    # one partition per page — the parallelism unit the reference lacks
    assert df.rdd.getNumPartitions() == 3
