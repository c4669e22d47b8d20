"""Multimodal-column queries (north-star): binary payload handling.

``multimodal_binary_meta`` is the pure-JVM path (binary encode + hash
functions).  ``multimodal_decode_features`` drives the real Arrow/mapInPandas
plumbing of operators.multimodal — its deterministic fake decoder is
reproduced in the oracle from the sha256 hex digits, so even the Python-UDF
path is value-checked cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as M
from . import load, register


@register(
    "multimodal_binary_meta",
    demoted=True,  # decode_features covers the Arrow path; meta battery pytest-golden
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha_hex,
           CAST(octet_length(encode(substr(text, 1, 16))) AS BIGINT) AS head_bytes
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary handling, JVM-side: utf-8 encode, byte length, sha256 —
    the metadata scan a 100 TB blob corpus runs before any decode."""
    docs = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha_hex"),
        F.length(F.encode(F.substring("text", 1, 16), "utf-8")).cast("long").alias("head_bytes"),
    )


def _hexval(c: str) -> str:
    return f"(strpos('0123456789abcdef', {c}) - 1)"


def _digest_byte(i: int, col: str = "h") -> str:
    """i-th byte (0-based) of a sha256 digest, from its hex string column."""
    hi = _hexval(f"substr({col}, {2 * i + 1}, 1)")
    lo = _hexval(f"substr({col}, {2 * i + 2}, 1)")
    return f"({hi} * 16 + {lo})"


@register(
    "multimodal_decode_features",
    oracle=f"""
    WITH hashed AS (SELECT doc_id, sha256(text) AS h, octet_length(encode(text)) AS nb
                    FROM documents)
    SELECT doc_id AS media_id,
           CAST(nb AS BIGINT) AS n_bytes,
           h AS sha256,
           CAST(320 + ({_digest_byte(0)} % 8) * 160 AS BIGINT) AS width,
           CAST(240 + ({_digest_byte(1)} % 8) * 120 AS BIGINT) AS height,
           CAST({_digest_byte(0)} AS DOUBLE) / 255.0 AS f0,
           CAST({_digest_byte(1)} AS DOUBLE) / 255.0 AS f1
    FROM hashed
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-batched decode path end-to-end: wrap text as a media record
    (binary payload), extract image metadata and a feature vector via
    ``mapInPandas`` (deterministic fake decoder — see operators.multimodal),
    join the two outputs, project the first feature dims.  The oracle
    recomputes the fake decoder from sha256 hex digits.  backend='fake' is
    PINNED (not 'auto'): the fixtures are text stand-ins and the oracle
    mirrors the fake convention — a runtime that happens to ship Pillow
    must not flip this row onto the real codec."""
    docs = load(spark, sf_dir, "documents")
    media = M.wrap_text_as_media(docs, "doc_id", "text")
    meta = M.decode_image_meta(media, backend="fake")
    feats = M.extract_features(media)
    return (
        meta.join(feats, "media_id")
        .select(
            "media_id",
            "n_bytes",
            "sha256",
            "width",
            "height",
            F.element_at("feature", 1).alias("f0"),
            F.element_at("feature", 2).alias("f1"),
        )
    )


_EVERY_N = 4


@register(
    "multimodal_frame_sample",
    # r6: demoted to the pytest oracle gate (identical DuckDB comparison) to
    # free a driver row for mixture_sample_temperature — the multimodal
    # family stays driver-graded via multimodal_decode_features.
    demoted=True,
    oracle=f"""
    WITH hashed AS (
        SELECT doc_id, sha256(text) AS h,
               CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_frames
        FROM documents
    ),
    frames AS (
        SELECT doc_id,
               sha256(h || '|' || CAST(idx AS VARCHAR)) AS fh,
               idx
        FROM (SELECT doc_id, h,
                     unnest(generate_series(0, CAST(greatest(n_frames, 1) - 1 AS BIGINT),
                                            {_EVERY_N})) AS idx
              FROM hashed)
    )
    SELECT doc_id AS media_id,
           CAST(idx AS BIGINT) AS frame_idx,
           CAST(idx * 100 AS BIGINT) AS ts_ms,
           fh AS frame_sha256,
           CAST(320 + ({_digest_byte(0, 'fh')} % 8) * 160 AS BIGINT) AS width,
           CAST(240 + ({_digest_byte(1, 'fh')} % 8) * 120 AS BIGINT) AS height
    FROM frames
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (every 4th frame) through the real mapInPandas
    fan-out plumbing — one media row yields ~n_frames/4 frame rows inside
    the Arrow batch, no explode shuffle.  The codec is the documented
    deterministic fake (operators.multimodal.frame_sample): frame hash =
    sha256 chain over (payload sha256 hex, frame index), dims from the
    frame digest — reproduced exactly by the oracle."""
    docs = load(spark, sf_dir, "documents")
    media = M.wrap_text_as_media(docs, "doc_id", "text")
    return M.frame_sample(media, every_n=_EVERY_N)
