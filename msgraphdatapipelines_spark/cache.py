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
    """(path, size, mtime) of every LEAF file under every input, through
    the recursive Hadoop FS listing — object-store-safe (directory
    entries on S3A/ABFS are synthetic with mtime 0, so directory mtimes
    carry no information; only leaf-file identities do) and
    nesting-safe (a file rewritten two partition levels deep changes
    its own (len, mtime), which a one-level listing would miss)."""
    from .sinks import _fs_for

    parts = []
    for path in sorted(inputs):
        fs, p, _ = _fs_for(spark, path)
        stats = []
        if fs.getFileStatus(p).isDirectory():
            it = fs.listFiles(p, True)  # recursive: every leaf file
            while it.hasNext():
                st = it.next()
                rel = st.getPath().toString()
                name = st.getPath().getName()
                if name.startswith(("_", ".")):
                    continue
                stats.append(f"{rel}|{st.getLen()}|{st.getModificationTime()}")
        else:
            st = fs.getFileStatus(p)
            stats.append(
                f"{st.getPath().toString()}|{st.getLen()}|{st.getModificationTime()}"
            )
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

    import uuid

    fp = plan_fingerprint(spark, df, inputs)
    root = result_cache_root(fp, base_dir)
    marker = os.path.join(root, "_rc_ready")
    data = os.path.join(root, "data")
    fs, _, jvm = _fs_for(spark, root)
    hpath = jvm.org.apache.hadoop.fs.Path
    if not fs.exists(hpath(marker)):
        # Concurrent-builder safety: never write into the final `data`
        # directory.  Each builder materializes under a private
        # data.<uuid> staging dir, then RENAMES it to `data` — rename is
        # atomic per directory entry, so a reader that already saw the
        # marker can never observe a half-overwritten artifact.  Exactly
        # one racer's rename lands; losers see rename fail (or `data`
        # already present), delete their staging copy, and fall through
        # to the hit path.
        staging = f"{data}.{uuid.uuid4().hex[:12]}"
        df.write.mode("overwrite").parquet(staging)
        if fs.exists(hpath(data)) or not fs.rename(hpath(staging), hpath(data)):
            fs.delete(hpath(staging), True)  # lost the race: another builder won
        # Hadoop rename() with an existing dst DIRECTORY nests src inside
        # it instead of failing (HDFS semantics) — if a racer slipped
        # between our exists-check and rename, evict the stray child so
        # the winner's artifact stays byte-identical.
        stray = hpath(os.path.join(data, os.path.basename(staging)))
        if fs.exists(stray):
            fs.delete(stray, True)
        if not fs.exists(hpath(marker)):
            tmp = hpath(f"{marker}.{uuid.uuid4().hex[:12]}.tmp")
            out = fs.create(tmp, True)
            out.write(bytearray(fp.encode()))
            out.close()
            if not fs.rename(tmp, hpath(marker)) and fs.exists(tmp):
                fs.delete(tmp, False)
    return spark.read.parquet(data)
