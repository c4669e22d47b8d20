"""Dump ``explain('formatted')`` for named declared queries to files.

Usage:
    python tools/dump_plans.py <outdir> <suffix> [query ...]

Writes ``<outdir>/<query>_<suffix>.txt`` per query.  Streaming rows
(memory-sink drains) explain as the drained batch table plus a header
noting that the streaming execution itself is profiled via
tools/profile_query.py (stage metrics), since the drain happens inside
the query fn.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from msgraphdatapipelines_spark.queries import DEMOTED, REGISTRY, _ensure_loaded  # noqa: E402
from msgraphdatapipelines_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    _ensure_loaded()
    rows = {**REGISTRY, **DEMOTED}
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = rows[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print("wrote", name)
    spark.stop()


if __name__ == "__main__":
    main()
