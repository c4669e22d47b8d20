"""Continuous ingest into the standing prefix-gram (PPJoin) index.

The batch artifact (queries.dedup.ensure_prefix_gram_index +
prefix_index_append) persists the exact-recall set-similarity join's
prefix tables and grows them under the FROZEN vocab order; this module
drives that growth from a document stream — the incremental-crawl
pipeline where compliance-grade dedup must stay queryable while the
corpus arrives batch by batch.

Crash safety follows the house foreachBatch discipline (dedup_stream,
ann_stream): each micro-batch appends under the DETERMINISTIC batch id,
so a replayed batch finds its directories already published and becomes
a no-op — no double-append, no duplicate pairs.  Under the r12
generational protocol this idempotency survives COMPACTION too: a
folded batch id lands in the new generation's ``_folded`` manifest, so
a checkpoint replay of a compacted-away micro-batch is still a no-op,
and an append racing a compact re-publishes into the new generation
after waiting out the compaction lease (queries.dedup.prefix_index_append).
All heavy work is ordinary batch Spark inside ``foreachBatch``; the
operator's exactness argument (a consistent total order preserves the
prefix-filter theorem) applies to every batch identically.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def prefix_index_stream(
    spark: SparkSession,
    docs_dir: str,
    schema: T.StructType,
    root: str,
    checkpoint_dir: str,
    n: int = 3,
    threshold: float = 0.5,
) -> StreamingQuery:
    """Start the ingest stream: ``docs_dir`` is watched as a parquet file
    stream (one arriving file = one micro-batch); each batch's sets and
    prefix rows publish under ``batch_b<id>`` subdirs of the standing
    index's LIVE GENERATION at ``root`` (which must already exist —
    built by ensure_prefix_gram_index / prefix_index_build, since the
    generation's frozen vocab is the order every batch sorts under)."""
    from ..queries.dedup import prefix_index_append

    def append(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        prefix_index_append(
            spark, root, batch_df, n=n, threshold=threshold, bid=f"b{batch_id}"
        )

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
        .writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(append)
        .start()
    )
