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


def _canon_input(spark: SparkSession, p: str) -> str:
    """Canonical spelling of a provenance path (r16, ADVICE): qualify
    through ``fs.makeQualified(Path(p))`` so ``file:/t/x``, ``/t/x``,
    relative, and trailing-slash spellings all compare equal — an
    erasure match in a compliance path must not depend on how the
    builder happened to spell the input (``os.path.normpath`` alone
    mangles ``scheme://`` prefixes and misses scheme-vs-plain pairs).
    Falls back to ``os.path.abspath`` if the path can't be qualified
    (malformed URI in an old meta record — still better than keeping)."""
    from .sinks import _fs_for

    try:
        fs, hp, _ = _fs_for(spark, p)
        return fs.makeQualified(hp).toString()
    except Exception:  # noqa: BLE001 — unparseable recorded path
        return os.path.abspath(p)


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
        # entry provenance (r15): the input paths travel WITH the entry
        # so result_cache_forget can target every entry derived from an
        # erased table immediately — without this, erased content sits
        # inside stranded entries until the TTL sweep (the fingerprint
        # is a hash; nothing else records what an entry was built from)
        meta_p = os.path.join(root, "_rc_meta.json")
        if not fs.exists(hpath(meta_p)):
            import json

            mtmp = hpath(f"{meta_p}.{uuid.uuid4().hex[:12]}.tmp")
            out = fs.create(mtmp, True)
            out.write(
                bytearray(
                    json.dumps(
                        {"inputs": sorted(_canon_input(spark, p) for p in inputs)}
                    ).encode("utf-8")
                )
            )
            out.close()
            if not fs.rename(mtmp, hpath(meta_p)) and fs.exists(mtmp):
                fs.delete(mtmp, False)
        if not fs.exists(hpath(marker)):
            tmp = hpath(f"{marker}.{uuid.uuid4().hex[:12]}.tmp")
            out = fs.create(tmp, True)
            out.write(bytearray(fp.encode()))
            out.close()
            if not fs.rename(tmp, hpath(marker)) and fs.exists(tmp):
                fs.delete(tmp, False)
    return spark.read.parquet(data)


def result_cache_forget(
    spark: SparkSession,
    input_path: str,
    base_dir: str | None = None,
    delete_unknown: bool = True,
) -> dict:
    """GDPR reach into the RESULT-REUSE layer (r15): delete every cached
    entry derived from ``input_path`` — the immediate counterpart of the
    standing-store forgets (`prefix_index_forget` / `lexicon_forget` /
    `ann_index_forget`).  Without it, a result built from a table that
    later had documents erased keeps serving (and storing) the erased
    content until the entry's inputs change AND the TTL sweep collects
    the stranded root — neither bounded nor auditable.

    Matching is by recorded provenance (`_rc_meta.json`, written at
    publish): an entry is deleted when any recorded input equals
    ``input_path`` or nests under it (erasing a table forgets entries
    built from any of its partitions/files).  Entries with NO provenance
    record (pre-r15 builds, torn writes) are deleted too by default —
    for an erasure pass, "cannot prove clean" must mean "gone"
    (``delete_unknown=False`` restricts to proven matches, the
    non-compliance-critical mode).

    Returns ``{"removed": [...], "kept": [...]}`` (absolute paths).
    Safe against concurrent READERS of unrelated entries; a concurrent
    builder of a MATCHING fingerprint can republish after this sweep —
    run erasure passes from the maintenance scheduler and re-run the
    forget after upstream erasure republishes the source (the rebuilt
    entry then derives from the post-erasure inputs, which is the
    steady state this function exists to reach)."""
    import json

    from .sinks import _fs_for

    base = base_dir or tempfile.gettempdir()
    # canonicalize BOTH sides through makeQualified (r16, ADVICE): an
    # entry recorded with an equivalent but differently-spelled input
    # (file:/… vs plain, relative vs absolute) must still match — a
    # missed erasure here is a compliance failure, not a cache miss
    target = _canon_input(spark, input_path)
    fs, bp, jvm = _fs_for(spark, base)
    hpath = jvm.org.apache.hadoop.fs.Path
    removed, kept = [], []
    if not fs.exists(bp):
        return {"removed": removed, "kept": kept}
    for st in fs.listStatus(bp):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("msgdp_rc_")):
            continue
        root = os.path.join(base, name)
        meta_p = hpath(os.path.join(root, "_rc_meta.json"))
        matches = delete_unknown
        if fs.exists(meta_p):
            stream = fs.open(meta_p)
            try:
                meta = json.loads(bytes(stream.readAllBytes()).decode("utf-8"))
            finally:
                stream.close()
            matches = any(
                q == target or q.startswith(target.rstrip("/") + "/")
                for q in (
                    _canon_input(spark, p) for p in meta.get("inputs", [])
                )
            )
        if matches:
            fs.delete(st.getPath(), True)
            removed.append(root)
        else:
            kept.append(root)
    return {"removed": removed, "kept": kept}
