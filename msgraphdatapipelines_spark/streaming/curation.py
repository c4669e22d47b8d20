"""Continuous-curation pipeline — ingest → incremental dedup → sketch
rollup composed as ONE stream (r6 VERDICT item 3).

This is the reference's scheduled-runbook model
(`Invoke-GraphDataPipelineToAzureSQLDatabase.ps1` — a timer trigger
re-snapshotting a Graph collection) promoted to the engine's streaming
curation flow: every tick pulls one OData delta round, folds it into the
keyed document snapshot, assigns the round's new/updated documents
against the persisted LSH dedup state, and appends the round's mergeable
distinct-count sketch rows — the full crawl→curate→account loop a
training-data pipeline runs continuously.

Composition instead of three separate streams: all four steps share one
``foreachBatch`` round, so the crash-consistency story is a single
ordered commit protocol rather than three queues to reconcile:

1. ``read_odata_delta`` — resumes from the delta token (never advanced
   by the read itself);
2. batch-keyed outputs first, all idempotent OVERWRITE:
   assignments → ``{assign_dir}/batch_id=N``, sketch rows →
   ``{rollup_dir}/batch_id=N``;
3. state folds next: snapshot ← ``apply_delta`` (keyed upsert +
   tombstones — re-applying the same delta is a no-op), dedup bucket
   state ← min-fold (re-folding the same docs is a no-op: min is
   idempotent);
4. ``save_delta_state`` LAST — the commit point.  A crash anywhere
   before it replays the SAME change window against states that either
   missed the fold (identical rerun) or already absorbed it
   (idempotent rerun).

Replay stability: ``rep_id`` assignments are replay-stable even when the
crash lands between the dedup-state fold and the token save (a doc
re-assigned against the already-folded state still finds the same
minimum representative — its own fold can only have installed itself or
its rep as the bucket min).  The ``is_new_cluster`` flag alone can flip
true→false in that window (the replica finds its own cluster already
registered) — benign, cluster identities never change.

Scale: every step is the underlying batch operator inside foreachBatch,
so their 100 TB notes apply unchanged (delta pages via the DataSource
past the page threshold, one bucket-keyed join for dedup with state
O(buckets), O(dims) sketch rows per round, one keyed anti-join for the
snapshot fold).  The tick stream carries no data — it is the schedule.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from .. import sinks
from ..operators import dedup as D
from ..operators.sketches import build_distinct_sketches
from ..sources import rest


def curation_pipeline_stream(
    spark: SparkSession,
    tick_dir: str,
    first_url: str,
    schema: T.StructType,
    state_path: str,
    snapshot_path: str,
    keys: list[str],
    dedup_state_path: str,
    assign_dir: str,
    rollup_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    part_cols: list[str] | None = None,
    value_col: str | None = None,
    fetcher: Callable[[str], str] = rest.file_fetcher,
    removed_col: str = "_removed",
    num_hashes: int = 8,
    bands: int = 4,
    lgk: int = 12,
    index_dir: str | None = None,
    embeddings_for: Callable | None = None,
    centroids: list | None = None,
    codebooks: list | None = None,
    dim: int = 64,
    standing_root: str | None = None,
    rebalance_max_share: float | None = None,
) -> StreamingQuery:
    """Start the composed curation stream (one delta round per tick file;
    ``maxFilesPerTrigger=1`` keeps rounds sequential, the checkpoint makes
    restarts resume at the next unprocessed tick).

    Per-round artifacts:
    - ``snapshot_path``: the curated keyed document snapshot (upserts +
      tombstone deletes applied);
    - ``{assign_dir}/batch_id=N``: (id, rep_id, is_new_cluster) for the
      round's upserted docs — the incremental dedup verdicts;
    - ``{rollup_dir}/batch_id=N``: mergeable HLL sketch rows over the
      round's upserts (merge the directory for any range estimate);
    - ``dedup_state_path`` / ``state_path``: bucket→rep state and the
      delta resume token.

    ``part_cols``/``value_col`` default to ``[]``/``id_col`` — a global
    distinct-docs-ingested sketch per round.

    **Index maintenance (r8, r7 VERDICT item 8).**  With ``index_dir`` +
    ``embeddings_for`` + frozen ``centroids``/``codebooks`` set, each
    round ALSO feeds the ANN index: the round's curated SURVIVORS (docs
    whose dedup verdict is rep_id == own id — near-dup losers never get
    indexed) are embedded via ``embeddings_for(docs_df) -> (id_col,
    'embedding')`` (production: the inference UDF; tests: a lookup join)
    and encoded under the frozen models into
    ``{index_dir}/batch_id=N/`` — ``ann_index_stream``'s per-batch
    idempotent overwrite, composed into the SAME round so ingest → dedup
    → index is one crash-consistent commit protocol.  Tombstoned docs
    emit ``cent = -1`` marker rows; ``ann_stream.read_ann_index`` resolves
    last-write-wins per cid and drops tombstoned entries, so an updated
    doc is served by its NEWEST encoding and a deleted doc disappears —
    without ever rewriting old index partitions (grow-only appends).

    **Self-rebalancing standing index (r13, the r12 VERDICT item-2
    composition).**  With ``standing_root`` set (instead of a bare
    ``index_dir``), the stream owns the full standing-root layout:
    ``centroids``/``codebooks`` become the BOOTSTRAP models
    (``init_ann_stream_root`` persists them once), every round RELOADS
    the version-matched models (``current_ann_models``) before
    encoding, and — when ``rebalance_max_share`` is set — the round
    ends with the occupancy check: if drift has skewed a list past the
    threshold, ``ann_rebalance_if_skewed`` retrains (k ∝ √n), re-encodes
    the currently-indexed docs (re-embedded from the curated snapshot —
    tombstoned docs are gone from it, so they stay gone), and publishes
    the retrained generation behind one pointer flip.  The next round
    encodes under the new quantizer automatically.  Crash/replay: the
    check runs AFTER the round's commit point, so a crash just defers
    the retrain to the next round (the trigger is still breached); a
    replayed round re-appends idempotently and the re-check no-ops once
    occupancy is healthy.
    """
    part_cols = part_cols or []
    value_col = value_col or id_col
    if standing_root is not None:
        if index_dir is not None:
            raise ValueError("pass standing_root OR index_dir, not both")
        if embeddings_for is None or centroids is None or codebooks is None:
            raise ValueError(
                "standing_root requires embeddings_for and bootstrap models"
            )
        from .ann_stream import init_ann_stream_root

        init_ann_stream_root(spark, standing_root, centroids, codebooks)
        index_dir = f"{standing_root}/batches"
    if index_dir is not None and (
        embeddings_for is None or centroids is None or codebooks is None
    ):
        raise ValueError(
            "index_dir requires embeddings_for, centroids and codebooks"
        )

    def one_round(_batch_df, batch_id: int) -> None:
        if standing_root is not None:
            # r14: a rebalance that crashed between its two batches-swap
            # renames leaves no batches dir — complete the swap before
            # this round reads or appends to it
            from .ann_stream import recover_batches

            recover_batches(spark, standing_root)
        delta, link = rest.read_odata_delta(
            spark, first_url, schema, state_path=state_path,
            fetcher=fetcher, removed_col=removed_col,
        )
        # one materialization feeds the three consumers (dedup, sketch,
        # snapshot fold) — same pinning rationale as delta_sync_stream
        delta = delta.localCheckpoint(eager=True)
        upserts = delta.filter(~F.col(removed_col))

        # (2) batch-keyed idempotent outputs
        grams = upserts.select(
            id_col, F.explode(D.word_ngrams(text_col, 3)).alias("g")
        )
        sigs = D.minhash_signatures(grams, id_col, "g", num_hashes=num_hashes)
        # explicit existence probes (r7 ADVICE item 2): a read failure on
        # EXISTING state fails the round (token unmoved, replayed on
        # restart) instead of silently restarting from empty state; a
        # pre-versioning flat-layout state dir migrates in place first
        # (r9 — never mistaken for "first round")
        sinks.ensure_versioned_layout(spark, dedup_state_path)
        if sinks.snapshot_exists(spark, dedup_state_path):
            dstate = sinks.read_snapshot(spark, dedup_state_path)
        else:
            dstate = None
        assigns, new_dstate = D.lsh_incremental_assign(
            sigs, dstate, id_col, num_hashes=num_hashes, bands=bands
        )
        assigns = assigns.localCheckpoint(eager=True)  # 2 consumers: write + index gate
        assigns.write.mode("overwrite").parquet(f"{assign_dir}/batch_id={batch_id}")
        build_distinct_sketches(upserts, part_cols, value_col, lgk=lgk).write.mode(
            "overwrite"
        ).parquet(f"{rollup_dir}/batch_id={batch_id}")

        if index_dir is not None:
            from ..operators import similarity as SIM

            if standing_root is not None:
                # per-round model reload: a rebalance committed since the
                # last round means this round encodes under the NEW
                # quantizer (version-matched with the published snapshot)
                from .ann_stream import current_ann_models

                _, round_cents, round_books = current_ann_models(
                    spark, standing_root
                )
            else:
                round_cents, round_books = centroids, codebooks
            kept_ids = assigns.filter(F.col("rep_id") == F.col(id_col)).select(id_col)
            vecs = embeddings_for(upserts.join(kept_ids, id_col))
            rows = SIM.ivf_pq_index(
                vecs, id_col, "embedding", round_cents, round_books, dim=dim
            )
            tomb = delta.filter(F.col(removed_col)).select(
                F.col(id_col).alias("cid"),
                F.lit(-1).alias("cent"),
                F.expr("array()").cast("array<int>").alias("code"),
            )
            rows.unionByName(tomb).write.mode("overwrite").parquet(
                f"{index_dir}/batch_id={batch_id}"
            )

        # (3) state folds — both idempotent under same-window replay, both
        # published as NEW snapshot versions with an atomic _LATEST flip
        # (crash mid-write keeps the previous complete state)
        sinks.ensure_versioned_layout(spark, snapshot_path)
        if sinks.snapshot_exists(spark, snapshot_path):
            snapshot = sinks.read_snapshot(spark, snapshot_path)
        else:
            snapshot = spark.createDataFrame([], schema)
        merged = sinks.apply_delta(snapshot, delta, keys, removed_col=removed_col)
        sinks.write_snapshot(merged, snapshot_path, keep_last=2)
        sinks.write_snapshot(new_dstate, dedup_state_path, keep_last=2)

        # (4) commit point
        if link:
            rest.save_delta_state(state_path, link)

        # (5) POST-commit maintenance: the occupancy-triggered rebalance
        # (crash here only defers the retrain — the round is committed)
        if standing_root is not None and rebalance_max_share is not None:
            from ..queries.similarity import ann_rebalance_if_skewed
            from .ann_stream import read_ann_index

            cur = sinks.read_snapshot(spark, snapshot_path)
            indexed = read_ann_index(spark, f"{standing_root}/batches").select(
                F.col("cid").alias(id_col)
            )
            retrain_vecs = embeddings_for(cur.join(indexed, id_col))
            ann_rebalance_if_skewed(
                spark,
                standing_root,
                retrain_vecs,
                id_col=id_col,
                vec_col="embedding",
                meta_cols=(),
                max_share_ratio=rebalance_max_share,
                dim=dim,
            )

    return (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .text(tick_dir)
        .writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(one_round)
        .start()
    )
