"""Continuous corpus dedup — incremental LSH assignment driven by a
document stream.

The batch operator (``operators.dedup.lsh_incremental_assign``) dedups a
new batch against the persisted bucket→representative state; this module
runs that flow continuously: each micro-batch of newly-arrived documents
is assigned against the state and the state is folded forward — the
incremental-crawl pipeline (corpus grows batch by batch, old documents
are never reprocessed) as one long-running stream.

Crash safety mirrors ``delta_sync_stream``'s commit ordering: per-batch
assignment output is written to a batch-id-keyed directory (OVERWRITE —
idempotent under replay), and the state parquet is rewritten only after;
a crash anywhere inside the batch replays it from the same source offset
with the same state, producing byte-identical output.  All heavy work is
ordinary batch Spark inside ``foreachBatch`` — the operator's 100 TB
notes (one bucket-keyed join, state O(buckets), no pairs) apply
unchanged.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators import dedup as D


def dedup_assign_stream(
    spark: SparkSession,
    docs_dir: str,
    schema: T.StructType,
    state_path: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    hash_fn: str = "xxhash64",
) -> StreamingQuery:
    """Start the dedup stream over a document file stream.

    ``docs_dir`` is watched as a parquet file stream
    (``maxFilesPerTrigger=1`` — one arriving file = one batch).  Each
    batch: gram → MinHash signatures → ``lsh_incremental_assign`` against
    the state at ``state_path`` → assignments to
    ``{out_dir}/batch_id=N/`` → updated state back to ``state_path``.
    The updated state is pinned (eager localCheckpoint) before the
    overwrite because its plan reads the directory being replaced.
    """

    def assign(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        grams = batch_df.select(
            id_col, F.explode(D.word_ngrams(text_col, 3)).alias("g")
        )
        sigs = D.minhash_signatures(
            grams, id_col, "g", num_hashes=num_hashes, hash_fn=hash_fn
        )
        try:
            state = spark.read.parquet(state_path)
        except Exception:  # noqa: BLE001 — first batch: no state yet
            state = None
        assigns, new_state = D.lsh_incremental_assign(
            sigs, state, id_col, num_hashes=num_hashes, bands=bands
        )
        assigns.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
        new_state.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            state_path
        )

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
        .writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(assign)
        .start()
    )
