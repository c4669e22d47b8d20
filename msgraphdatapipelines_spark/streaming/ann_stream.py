"""Continuous ANN index maintenance — incremental IVF+PQ appends driven by
an embedding stream (late-r7).

The batch operator (``operators.similarity.ivf_incremental_append``)
encodes a new vector batch under FIXED trained models and appends it to
the persisted ``(cid, cent, code)`` index; this module runs that flow
continuously: each micro-batch of newly-arrived vectors becomes an
appended index partition — the grow-only index pipeline (vectors arrive
batch by batch, previously-indexed vectors are never re-encoded) as one
long-running stream.

Output layout is ``{index_dir}/batch_id=N/`` (OVERWRITE per batch — a
replayed batch rewrites the same directory with byte-identical rows, so
the stream is idempotent under crash/restart; readers see the whole
index as ``spark.read.parquet(index_dir)``).  Unlike the dedup stream
there is NO mutable state to fold forward — the models are frozen
arguments — so batches are independent and the commit protocol is just
the idempotent per-batch overwrite.  The operational contract is the
batch operator's: monitor per-list counts and retrain + rebuild when
arriving batches drift off the trained distribution.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators import similarity as S


def ann_index_stream(
    spark: SparkSession,
    vectors_dir: str,
    schema: T.StructType,
    index_dir: str,
    checkpoint_dir: str,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> StreamingQuery:
    """Start the index-maintenance stream over an embedding file stream.

    ``vectors_dir`` is watched as a parquet file stream
    (``maxFilesPerTrigger=1`` — one arriving file = one batch).  Each
    batch: ``ivf_pq_index`` under the frozen models → index rows to
    ``{index_dir}/batch_id=N/``.
    """

    def append(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        rows = S.ivf_pq_index(batch_df, id_col, vec_col, centroids, codebooks, dim=dim)
        rows.write.mode("overwrite").parquet(f"{index_dir}/batch_id={batch_id}")

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(vectors_dir)
        .writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(append)
        .start()
    )
