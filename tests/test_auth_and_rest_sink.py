"""S6 token provider retry/caching and L8 batched REST sink."""

from __future__ import annotations

import json
import os
import uuid

import pytest

from msgraphdatapipelines_spark import sinks
from msgraphdatapipelines_spark.sources import rest


def test_token_provider_retries_then_caches():
    calls = {"n": 0}
    sleeps: list[float] = []

    def flaky_acquire() -> str:
        calls["n"] += 1
        if calls["n"] <= 2:
            raise rest.ThrottledError("identity endpoint busy")
        return "tok-abc"

    tp = rest.TokenProvider(flaky_acquire, rest.RetryPolicy(max_retries=5, sleep_s=10), sleeps.append)
    assert tp.token() == "tok-abc"
    assert sleeps == [10, 10]  # reference: 10 s auth retry sleeps
    assert tp.token() == "tok-abc" and calls["n"] == 3  # cached (SQL token reuse)
    tp.invalidate()
    assert tp.token() == "tok-abc" and calls["n"] == 4


def test_token_provider_budget_exhausted():
    def dead() -> str:
        raise rest.ThrottledError("never")

    tp = rest.TokenProvider(dead, rest.RetryPolicy(max_retries=1, sleep_s=0), lambda s: None)
    with pytest.raises(rest.ThrottledError):
        tp.token()


def test_write_rest_batched_posts_all_rows(spark, tmp_path):
    outdir = str(tmp_path / "posts")
    os.makedirs(outdir)

    def poster(endpoint: str, body: str) -> None:
        # executors run in separate processes: collect via the shared FS
        with open(f"{outdir}/{uuid.uuid4().hex}.json", "w") as f:
            f.write(json.dumps({"endpoint": endpoint, "body": json.loads(body)}))

    df = spark.range(1050).withColumnRenamed("id", "k").coalesce(2)
    n_batches = sinks.write_rest_batched(df, "https://logs.example/ingest", poster, batch_size=500)
    files = os.listdir(outdir)
    assert len(files) == n_batches >= 3  # 1050 rows / 500 per batch, ≥2 partitions
    seen = []
    for fn in files:
        rec = json.load(open(f"{outdir}/{fn}"))
        assert rec["endpoint"] == "https://logs.example/ingest"
        assert len(rec["body"]) <= 500
        seen.extend(r["k"] for r in rec["body"])
    assert sorted(seen) == list(range(1050))


def test_write_rest_batched_keeps_null_fields(spark, tmp_path):
    """r4 ADVICE: null-valued fields must post as explicit JSON nulls —
    the df.toJSON() default (ignoreNullFields=true) silently dropped the
    key from the payload, changing the posted record shape."""
    import pyspark.sql.functions as F

    outdir = str(tmp_path / "posts_null")
    os.makedirs(outdir)

    def poster(endpoint: str, body: str) -> None:
        with open(f"{outdir}/{uuid.uuid4().hex}.json", "w") as f:
            f.write(body)

    df = (
        spark.range(4)
        .withColumnRenamed("id", "k")
        .withColumn("label", F.when(F.col("k") % 2 == 0, F.lit("even")))
        .coalesce(1)
    )
    sinks.write_rest_batched(df, "https://logs.example/ingest", poster, batch_size=10)
    (fn,) = os.listdir(outdir)
    records = json.load(open(f"{outdir}/{fn}"))
    by_k = {r["k"]: r for r in records}
    assert by_k[1]["label"] is None and "label" in by_k[1]  # key present, null value
    assert by_k[0]["label"] == "even"


def test_build_url_expand():
    url = rest.build_url("https://g/devices", select=["id"], expand="members")
    assert "%24expand=members" in url or "$expand=members" in url
