"""Streaming maintenance of a Bloom-mapped table (late r10).

Composes the file-stream source with the batch Bloom layer in
``sinks``: each arriving micro-batch appends its rows as new data files
and then ``refresh_bloom_manifest`` scans ONLY those files into the
manifest (the append-only O(delta) path — no rewrite of old word rows).

Crash contract, inherited from the batch layer: a crash between the
data append and the manifest refresh leaves the new files
pruned-INVISIBLE (stale, never wrong); the next batch's refresh heals
them, because refresh finds every data file the manifest does not know
— including orphans from a crashed batch.  Replay after an
intra-batch crash re-appends the data files (duplicate rows are the
file-sink replay semantics shared by every append sink here), and the
re-scan is harmless: Bloom words are idempotent under OR.

Scale: per batch the work is O(batch bytes) hashing + one manifest
append; probes stay corpus-independent throughout.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from .. import sinks


def bloom_table_stream(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    table_dir: str,
    checkpoint_dir: str,
    col: str,
) -> StreamingQuery:
    """Watch ``source_dir`` as a parquet file stream; append each batch
    to ``table_dir`` and refresh its ``col`` Bloom manifest O(delta).
    The manifest must already exist (``build_bloom_manifest`` on the
    initial load)."""

    def append(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df.write.mode("append").parquet(table_dir)
        sinks.refresh_bloom_manifest(spark, table_dir, col)

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
        .writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(append)
        .start()
    )
