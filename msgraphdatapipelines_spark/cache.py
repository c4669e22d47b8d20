"""Plan-fingerprint result cache (late r10).

The standing-artifact layer (IVF+PQ index, BM25 lexicon, zone maps,
Bloom manifests, CM sketches) caches PER-OPERATOR state.  This module
adds the top of that ladder: caching a whole query's RESULT SET, keyed
by what actually determines it — the optimized logical plan plus the
identity of every input file.  The posture is the result-reuse layer
every serving warehouse keeps (Snowflake's result cache is the
best-known instance): a repeated dashboard/report query should cost one
artifact read, not one 100 TB scan, and a cache hit must be IMPOSSIBLE
when either the query or its inputs changed.

Correctness is structural, not temporal:

- The fingerprint hashes the OPTIMIZED plan (post-Catalyst), so two
  syntactically different but plan-identical queries share one entry,
  while any semantic difference — a changed literal, a different column
  — changes the plan text and therefore the key.  Expression IDs
  (``#123``) are session-assigned noise and are stripped before
  hashing.
- The fingerprint also hashes every input file's (name, size, mtime) —
  the same identity the standing layouts key on.  Touching an input
  changes the key, so a stale entry is never SERVED; it is merely
  stranded, and the ``msgdp_rc_`` prefix is registered with
  :func:`~msgraphdatapipelines_spark.sinks.vacuum_standing_artifacts`
  so the GC sweeps it.
- Publication is crash-safe in the house style: materialize under the
  final ``data`` directory, then commit with an atomically-renamed
  ``_rc_ready`` marker; a reader that sees no marker rebuilds.

Scale: a hit reads the (result-sized) artifact — zero corpus-sized
work; a miss costs the query plus one write of its result.  Result sets
cached here are aggregate/report-sized; this is NOT a CACHE TABLE
replacement for hot fact data.
"""

from __future__ import annotations

import hashlib
import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession


def _input_signature(spark: SparkSession, inputs: list[str]) -> str:
    """(name, size, mtime) of every input file, through the Hadoop FS API
    (recursing one level into directories) — object-store-safe, same
    identity discipline as the standing layouts."""
    from .sinks import _fs_for

    parts = []
    for path in sorted(inputs):
        fs, p, _ = _fs_for(spark, path)
        stats = []
        for st in fs.listStatus(p) if fs.getFileStatus(p).isDirectory() else [fs.getFileStatus(p)]:
            name = st.getPath().getName()
            if name.startswith(("_", ".")):
                continue
            stats.append(f"{name}|{st.getLen()}|{st.getModificationTime()}")
        parts.append(f"{path}::" + ",".join(sorted(stats)))
    return ";".join(parts)


def plan_fingerprint(spark: SparkSession, df: DataFrame, inputs: list[str]) -> str:
    """Cache key: sha256 of the canonicalized optimized plan + the input
    signature.  Canonicalization strips per-session expression IDs
    (``col#123`` → ``col#``) — the only session-varying noise in the
    plan text."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()  # noqa: SLF001
    canon = re.sub(r"#\d+", "#", plan)
    sig = _input_signature(spark, inputs)
    return hashlib.sha256(f"{canon}\n--\n{sig}\n--v1".encode()).hexdigest()[:20]


def result_cache_root(fingerprint: str, base_dir: str | None = None) -> str:
    return os.path.join(base_dir or tempfile.gettempdir(), f"msgdp_rc_{fingerprint}")


def serve_cached(
    spark: SparkSession,
    df: DataFrame,
    inputs: list[str],
    base_dir: str | None = None,
) -> DataFrame:
    """Serve ``df``'s result from the cache, materializing it at most
    once per (plan, inputs) fingerprint.

    First call for a fingerprint runs the query and publishes its result
    as a parquet artifact; every later call — any session, any process —
    returns a DataFrame reading ONLY the artifact (the physical plan
    contains the ``msgdp_rc_`` path and none of the source tables).  The
    rename-committed marker makes a torn write invisible: no marker, no
    hit, rebuild."""
    from .sinks import _fs_for

    fp = plan_fingerprint(spark, df, inputs)
    root = result_cache_root(fp, base_dir)
    marker = os.path.join(root, "_rc_ready")
    data = os.path.join(root, "data")
    fs, _, jvm = _fs_for(spark, root)
    hpath = jvm.org.apache.hadoop.fs.Path
    if not fs.exists(hpath(marker)):
        df.write.mode("overwrite").parquet(data)
        tmp = hpath(f"{marker}.tmp")
        out = fs.create(tmp, True)
        out.write(bytearray(fp.encode()))
        out.close()
        fs.rename(tmp, hpath(marker))
    return spark.read.parquet(data)
