"""End-to-end reference-parity pipeline: OData pages (Graph-shaped nested
JSON) → paged source with pushdown/retry → T1/T2 flatten → P5 conform →
L4 stamp → L2 parquet snapshot — the full lifecycle of SURVEY.md §3.1,
driven through pipelines.run_all."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from msgraphdatapipelines_spark import schemas, sinks
from msgraphdatapipelines_spark.operators import flatten, project
from msgraphdatapipelines_spark.pipelines import Pipeline, run_all
from msgraphdatapipelines_spark.sources import rest


def _device(i: int, with_users: bool) -> dict:
    return {
        "id": f"dev-{i}",
        "deviceName": f"host-{i}",
        "operatingSystemExtra": "DROP-ME",  # extra field: conform must drop
        "enrolledDateTime": f"2024-01-{(i % 27) + 1:02d}T08:00:00Z",
        "azureADRegistered": i % 2 == 0,
        "configurationManagerClientHealthState": (
            {"state": "healthy", "errorCode": i, "lastSyncDateTime": "2024-05-01T10:00:00Z"}
            if i % 3 != 0
            else None
        ),
        "usersLoggedOn": (
            [
                {"userId": f"u{i}-old", "lastLogOnDateTime": "2024-01-01T00:00:00Z"},
                {"userId": f"u{i}-new", "lastLogOnDateTime": "2024-04-01T00:00:00Z"},
            ]
            if with_users
            else []
        ),
    }


def test_managed_devices_pipeline_end_to_end(spark, tmp_path):
    # two chained OData pages of nested device records
    p1, p2 = tmp_path / "page1.json", tmp_path / "page2.json"
    p1.write_text(
        json.dumps(
            {"value": [_device(i, True) for i in range(5)], "@odata.nextLink": str(p2)}
        )
    )
    p2.write_text(json.dumps({"value": [_device(i, False) for i in range(5, 8)]}))
    out = str(tmp_path / "warehouse" / "managed_devices")

    def source(s):
        return rest.read_odata(s, str(p1), schemas.MANAGED_DEVICE_RAW)

    def transform(df):
        df = flatten.argmax_in_array(
            df,
            "usersLoggedOn",
            "lastLogOnDateTime",
            {
                "userLoggedOnUserId": ("userId", None),
                "userLoggedOnLastLogOnDateTime": ("lastLogOnDateTime", "timestamp"),
            },
        )
        df = flatten.flatten_struct(
            df,
            "configurationManagerClientHealthState",
            {
                "configurationManagerClientErrorCode": ("errorCode", "long"),
                "configurationManagerClientLastSyncDateTime": ("lastSyncDateTime", "timestamp"),
            },
        ).withColumn(
            "configurationManagerClientHealthState",
            F.col("configurationManagerClientHealthState.state"),
        )
        return sinks.stamp(project.conform(df, schemas.MANAGED_DEVICE_TARGET),
                           at=dt.datetime(2024, 6, 1))

    def sink(df):
        sinks.write_full_refresh(df, out, sort_by="id")

    results = run_all(spark, [Pipeline("managedDevices", source, transform, sink)])
    assert results[0].ok, results[0].error

    snap = spark.read.parquet(out)
    assert snap.count() == 8
    cols = [f.name for f in schemas.MANAGED_DEVICE_TARGET.fields] + [sinks.LOAD_STAMP]
    assert snap.columns == cols
    rows = {r["id"]: r for r in snap.collect()}
    assert rows["dev-1"]["userLoggedOnUserId"] == "u1-new"  # argmax picked latest
    assert rows["dev-5"]["userLoggedOnUserId"] is None  # empty array → null
    assert rows["dev-3"]["configurationManagerClientHealthState"] is None  # null struct
    assert rows["dev-1"]["configurationManagerClientErrorCode"] == 1
    assert rows["dev-2"]["timeGenerated"] == dt.datetime(2024, 6, 1)
    assert "operatingSystemExtra" not in snap.columns  # extra silently dropped

    # second run full-refreshes (L2): snapshot replaced, not appended
    results = run_all(spark, [Pipeline("managedDevices", source, transform, sink)])
    assert results[0].ok
    assert spark.read.parquet(out).count() == 8
