"""Continuous sketch rollup — incremental distinct-count analytics driven
by an event stream.

Composes the two r6 pieces: ``operators.sketches`` (mergeable HLL rollup
rows) and the ``foreachBatch`` incremental-sync pattern of
``streaming/delta.py``.  Each micro-batch appends its per-dimension HLL
sketch rows to the rollup table; ANY downstream range query merges the
tiny rollup instead of rescanning the stream's history — the streaming
counterpart of the batch rollup's "sketch once, merge forever" contract
(union-of-sketches ≡ sketch-of-union, pinned in test_operators).

Idempotence under replay: each batch writes to a ``batch_id=N``
subdirectory with OVERWRITE, so a crash-replayed micro-batch rewrites the
same rows instead of double-appending them — the merged estimate is
replay-stable.  Rollup rows are O(dims) per batch; the table stays tiny
at any stream length, and `sinks.compact_parquet` handles the
many-small-files tail if batches are frequent.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.sketches import build_distinct_sketches


def sketch_rollup_stream(
    spark: SparkSession,
    events_dir: str,
    schema: T.StructType,
    rollup_dir: str,
    checkpoint_dir: str,
    part_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> StreamingQuery:
    """Watch ``events_dir`` as a parquet file stream (one file per
    trigger); per micro-batch, write the batch's sketch rows to
    ``{rollup_dir}/batch_id=N/``.  Query side: read ``rollup_dir``
    recursively and ``merge_distinct_sketches`` over it.
    """

    def _one_batch(batch_df, batch_id: int) -> None:
        inc = build_distinct_sketches(batch_df, part_cols, value_col, lgk=lgk)
        inc.write.mode("overwrite").parquet(f"{rollup_dir}/batch_id={batch_id}")

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    return (
        src.writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
