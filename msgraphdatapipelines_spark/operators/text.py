"""Text-analysis operators (north-star): language ID, quality scoring,
token counting, document fingerprinting.

All pure Column expressions — regex/string/hash built-ins, zero Python in
the row path, so the operators cost one scan at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal per-language stopword marker sets for the heuristic classifier.
# Deterministic and tiny by design: the classifier is a scoring rule over
# marker hits, reproducible in plain SQL for the oracle twin.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
}

# BPE-ish token pattern: runs of letters, runs of digits, or single
# non-space symbols — the standard pre-tokenizer shape.
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens with empties removed."""
    t = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(t, " "), lambda w: w != "")


def token_count(text: Column | str) -> Column:
    """Whitespace token count (bigint)."""
    return F.size(tokens(text)).cast("long")


def bpe_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count via the BPE-style pre-tokenizer regex."""
    t = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_RE), 0)).cast("long")


def quality_stats(text: Column | str, ws: Column | None = None) -> dict[str, Column]:
    """Quality-scoring signals: length, token stats, stopword/digit ratios.

    Ratios are exact integer ratios cast to double (deterministic).

    Pass ``ws`` (a materialized ``tokens(text)`` column) when combining with
    other token-consuming operators: higher-order functions are
    codegen-fallback, so Catalyst does NOT common-subexpression-eliminate a
    repeated ``split``+``filter`` — tokenizing once in a prior projection
    (CollapseProject keeps non-cheap exprs referenced more than once staged)
    turns O(uses) tokenizations per row into one.
    """
    t = F.col(text) if isinstance(text, str) else text
    if ws is None:
        ws = tokens(t)
    n_tok = F.size(ws)
    stop = F.array([F.lit(w) for ms in LANG_MARKERS.values() for w in ms])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(stop, w)))
    n_digit_tok = F.size(F.filter(ws, lambda w: w.rlike("^[0-9]+$")))
    mean_len = F.when(
        n_tok > 0,
        F.aggregate(
            F.transform(ws, lambda w: F.length(w).cast("long")), F.lit(0).cast("long"), lambda a, b: a + b
        ).cast("double")
        / n_tok,
    )
    return {
        "n_chars": F.length(t).cast("long"),
        "n_tokens": n_tok.cast("long"),
        "mean_token_len": F.round(mean_len, 4),
        "stopword_ratio": F.round(n_stop.cast("double") / F.greatest(n_tok, F.lit(1)), 4),
        "digit_token_ratio": F.round(n_digit_tok.cast("double") / F.greatest(n_tok, F.lit(1)), 4),
    }


def lang_scores(text: Column | str, ws: Column | None = None) -> dict[str, Column]:
    """Per-language marker-hit counts (the language-ID signal).  ``ws``: see
    quality_stats — pass the materialized token array to tokenize once."""
    if ws is None:
        ws = tokens(text)
    return {
        lang: F.size(F.filter(ws, lambda w: F.array_contains(F.array(*[F.lit(m) for m in ms]), w)))
        for lang, ms in LANG_MARKERS.items()
    }


def lang_id_from_scores(scores_by_lang: dict[str, Column]) -> Column:
    """Argmax language from per-language score columns, 'und' when all zero.
    Deterministic tie-break: earlier dict order wins.  Feed it materialized
    score COLUMNS (cheap attribute refs) — a CASE chain over inline score
    expressions would re-evaluate each tokenization per branch."""
    scores = list(scores_by_lang.items())
    expr = F.lit("und")
    # build the CASE chain back-to-front; earlier languages win ties via >=
    for i in range(len(scores) - 1, -1, -1):
        lang, n = scores[i]
        cond = n > 0
        for _, later_n in scores[i + 1 :]:
            cond = cond & (n >= later_n)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def lang_id(text: Column | str, ws: Column | None = None) -> Column:
    """Heuristic language ID: argmax marker-hit count, 'und' when all zero.

    Deterministic tie-break: first language in LANG_MARKERS order wins.
    Standalone convenience — inside a multi-signal projection, materialize
    lang_scores as columns and use lang_id_from_scores instead.
    """
    return lang_id_from_scores(lang_scores(text, ws))


def tfidf_top_terms(
    df: "DataFrame",  # noqa: F821 - imported lazily to keep module Column-only
    id_col: str,
    text_col: str,
    k: int = 5,
) -> "DataFrame":  # noqa: F821
    """Top-k TF-IDF terms per document — the classic corpus-weighting
    operator behind keyword extraction and quality-by-informativeness
    filters.

    tf = in-document term count; idf = ln((N+1)/(df+1)) + 1 (smoothed);
    weight = tf·idf.  Ties break lexicographically for determinism.

    Scale shape: explode → ONE (doc, term) hash aggregation (map-side
    partials collapse duplicate terms early); document frequency is a
    second aggregation over the already-deduplicated (doc, term) pairs —
    input n_docs·distinct_terms, not raw tokens; the idf join broadcasts
    (vocabulary ≪ corpus); final top-k is a WindowGroupLimit-prunable
    ranking window per doc.  No stage touches raw text twice.
    """
    from pyspark.sql import DataFrame, Window  # local import: module is else expr-only

    assert isinstance(df, DataFrame)
    n_docs = df.select(id_col).distinct().count()  # model scalar, like IVF centroids
    pairs = (
        df.select(F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("term"))
        .groupBy("doc", "term")
        .agg(F.count("*").alias("tf"))
    )
    docfreq = pairs.groupBy("term").agg(F.count("*").alias("df_"))
    idf = F.log((F.lit(n_docs) + 1.0) / (F.col("df_") + 1.0)) + 1.0
    weighted = pairs.join(F.broadcast(docfreq.withColumn("idf", idf)), "term").select(
        "doc", "term", (F.col("tf") * F.col("idf")).alias("weight")
    )
    w = Window.partitionBy("doc").orderBy(F.desc("weight"), F.asc("term"))
    return (
        weighted.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("doc").alias(id_col), "term", F.round("weight", 6).alias("weight"), "rank"
        )
    )


def fingerprint_exact(text: Column | str) -> Column:
    """Exact-dup fingerprint: md5 of the normalized text (lowercase,
    whitespace collapsed).  Two docs with equal fingerprints are duplicates
    after normalization — the O(n) dedup key."""
    t = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(t)), "\\s+", " "))


def fingerprint_minhash1(text: Column | str, k: int = 5, hash_fn: str = "md5") -> Column:
    """Content fingerprint robust to local edits: the minimum hash over the
    document's character k-shingles (a 1-hash MinHash).  Docs sharing it are
    near-dup candidates.

    ``hash_fn`` (r2 VERDICT item 4, same switch as operators/dedup._hash_hex):
    ``"md5"`` — hex string, cross-engine reproducible, the oracle-checked
    default; ``"xxhash64"`` — JVM 64-bit hash as a bigint, the production
    mode (one shingle hash per char position per doc is the scan's hot
    loop, and xxhash64 is severalfold cheaper than md5's hex round-trip).
    Both are deterministic; bucket equality agrees between modes only in
    the sense that equal shingle sets ⇒ equal fingerprints (pinned in
    tests/test_text.py).
    """
    from ..functions import char_shingles

    sh = char_shingles(text, k)
    if hash_fn == "md5":
        return F.array_min(F.transform(sh, lambda s: F.md5(s)))
    if hash_fn == "xxhash64":
        return F.array_min(F.transform(sh, lambda s: F.xxhash64(s)))
    raise ValueError(f"unknown hash fn {hash_fn!r}")


# Portable PII patterns: identical semantics under Java regex (Spark) and
# RE2 (DuckDB) — no lookarounds, no backrefs, ASCII classes only.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
    "ssn": (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
}


def pii_scrub(text: Column | str) -> dict[str, Column]:
    """PII redaction + per-kind match counts — the curation scrub pass.

    Pure Column expressions (regexp_replace / regexp_extract_all), one
    scan; replacement order is the fixed dict order so nested matches
    (an SSN inside an already-replaced span) behave identically in any
    engine running the same order.
    """
    t = F.col(text) if isinstance(text, str) else text
    out: dict[str, Column] = {}
    scrubbed = t
    for kind, (pat, repl) in PII_PATTERNS.items():
        out[f"n_{kind}"] = F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("long")
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    out["scrubbed"] = scrubbed
    return out


def chunk_text(
    df: "DataFrame",  # noqa: F821
    id_col: str,
    text_col: str,
    size: int = 200,
    stride: int = 150,
) -> "DataFrame":  # noqa: F821
    """Overlapping fixed-size character chunking (RAG/window prep): chunk i
    covers ``[i·stride, i·stride + size)``; ``n_chunks =
    max((len-1) div stride + 1, 1)`` so every character is covered and an
    empty document still yields one (empty) chunk.

    The chunk array builds per-row (sequence + transform + substr — pure
    codegen, same pattern as char_shingles) and ``posexplode`` fans out
    rows; the explode is the only row-count change, no shuffle.  Integer
    ``div`` keeps the chunk count exact in both engines.
    """
    from pyspark.sql import DataFrame  # local import: module is else expr-only

    assert isinstance(df, DataFrame)
    t = F.col(text_col)
    n = F.greatest(F.expr(f"(length({text_col}) - 1) div {stride}") + 1, F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), n - 1), lambda i: t.substr(i * stride + 1, F.lit(size))
    )
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_chunks"),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    ).select(
        id_col, F.col("chunk_idx").cast("long").alias("chunk_idx"), "chunk_text", "n_chunks"
    )


def repetition_signals(text: Column | str, ws: Column | None = None) -> dict[str, Column]:
    """Repetition quality signals (the Gopher/MassiveText-style heuristics
    used to drop boilerplate and degenerate generations from training
    corpora): token- and n-gram-level duplication ratios plus the most
    frequent token's mass.  All pure per-row codegen (split + higher-order
    array functions) — a single corpus scan scores everything, no shuffle.

    - ``dup_token_ratio``   = 1 − |distinct tokens| / |tokens|
    - ``top_token_ratio``   = occurrences of the most frequent token / |tokens|
    - ``dup_2gram_ratio``   = 1 − |distinct 2-grams| / |2-grams|
    - ``dup_3gram_ratio``   = 1 − |distinct 3-grams| / |3-grams|

    High values mean the document repeats itself; typical curation drops
    docs with dup_3gram_ratio or top_token_ratio above a corpus-tuned cut.
    """
    t = F.col(text) if isinstance(text, str) else text
    w = ws if ws is not None else tokens(t)
    n = F.greatest(F.size(w), F.lit(1))

    def _ngrams(k: int) -> Column:
        cnt = F.greatest(F.size(w) - F.lit(k - 1), F.lit(1))
        return F.transform(
            F.sequence(F.lit(1), cnt), lambda i: F.array_join(F.slice(w, i, k), " ")
        )

    top = F.array_max(
        F.transform(
            F.array_distinct(w),
            lambda tok: F.size(F.filter(w, lambda x: x == tok)),
        )
    )
    g2, g3 = _ngrams(2), _ngrams(3)
    return {
        "dup_token_ratio": F.round(
            F.lit(1.0) - F.size(F.array_distinct(w)).cast("double") / n, 6
        ),
        "top_token_ratio": F.round(
            F.coalesce(top, F.lit(0)).cast("double") / n, 6
        ),
        "dup_2gram_ratio": F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(g2)).cast("double") / F.greatest(F.size(g2), F.lit(1)),
            6,
        ),
        "dup_3gram_ratio": F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(g3)).cast("double") / F.greatest(F.size(g3), F.lit(1)),
            6,
        ),
    }


def segment_windows(text: Column | str, width: int = 8, ws: Column | None = None) -> Column:
    """Disjoint ``width``-token segments of a document, each re-joined with
    single spaces (the trailing segment may be shorter).

    This is the unit of corpus-level boilerplate removal (see
    ``strip_frequent_segments``): published training-data pipelines dedup
    repeated *lines*; this corpus has no line structure, so fixed token
    windows play the same role deterministically.  ``n_segments =
    (n_tokens + width - 1) div width`` — integer ``div`` keeps the count
    exact in both engines, and a document with no tokens yields an empty
    array (``sequence`` is guarded: Spark's default step is −1 when
    start > stop, which would silently produce ``[0, -1]``).
    """
    t = F.col(text) if isinstance(text, str) else text
    w = ws if ws is not None else tokens(t)
    # integer-exact ceil(n_tokens / width): (n + width-1) div width
    n_seg = ((F.size(w) + F.lit(width - 1)) / F.lit(width)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(F.slice(w, i * width + 1, width), " "),
    )
    return F.when(F.size(w) > 0, segs).otherwise(F.array().cast("array<string>"))


def strip_frequent_segments(
    df: "DataFrame",  # noqa: F821
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
    min_docs: int = 3,
    max_frequent: int = 100_000,
    rebuild: str = "auto",
) -> "DataFrame":  # noqa: F821
    """Corpus-wide boilerplate removal: drop every ``width``-token segment
    that occurs in ≥ ``min_docs`` DISTINCT documents, rebuild each document
    from its surviving segments in original order.

    The line-dedup step of public corpus pipelines (CCNet §4.1 "we
    deduplicate paragraphs"; Lee et al. 2022 exact-substring dedup;
    reference analog: the conform/clean stage of
    `Invoke-GraphDataPipelineToAzureSQLDatabase.ps1:131-168`, which strips
    repeated envelope noise before load) expressed for Spark scale:

    1. one scan → per-doc segment arrays (pure codegen, see
       ``segment_windows``);
    2. ONE shuffle: explode → groupBy(segment) → count_distinct(doc) —
       map-side partial aggregation collapses each partition's repeats
       before the exchange; the frequent set is bounded by ``max_frequent``
       (highest-document-count segments first, lexicographic tiebreak →
       deterministic under truncation);
    3. rebuild, two identical-output modes chosen by ``rebuild``:

       - ``'array'``: fold the frequent set to ONE sorted broadcast array
         and drop per row with ``filter(segs, s -> !array_contains(…))`` —
         zero extra shuffle, but each segment pays an O(|frequent|) linear
         probe (literal arrays have no hash lookup).  Right when the
         frequent set is genuinely small (clean corpora, tight caps).
       - ``'join'``: posexplode → broadcast HASH join against the frequent
         table (O(1) probes) → re-aggregate per doc ordered by position.
         One extra doc-keyed shuffle + a per-doc-bounded collect_list, but
         rebuild cost is corpus-linear REGARDLESS of |frequent| — the 100×
         sweep caught the array mode at 78k frequent segments × 6M probes
         (duplication-heavy corpora make the frequent set corpus-sized; see
         PERF.md r6).
       - ``'auto'`` (default): ``'array'`` iff ``max_frequent ≤ 4096``
         (the cap bounds the probe), else ``'join'``.

    Output: ``id_col, clean_text, n_segments, n_dropped`` — one row per
    input document (documents that were pure boilerplate come back with an
    empty ``clean_text``, preserving corpus accounting).
    """
    from pyspark.sql import DataFrame  # local import: module is else expr-only

    assert isinstance(df, DataFrame)
    if rebuild == "auto":
        rebuild = "array" if max_frequent <= 4096 else "join"
    ws = tokens(text_col)
    base = df.select(F.col(id_col), segment_windows(text_col, width=width, ws=ws).alias("segs"))
    frequent = (
        base.select(F.col(id_col), F.explode("segs").alias("seg"))
        .groupBy("seg")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .orderBy(F.col("n_docs").desc(), F.col("seg"))
        .limit(max_frequent)
    )
    if rebuild == "array":
        folded = frequent.agg(F.sort_array(F.collect_list("seg")).alias("freq_segs"))
        joined = base.crossJoin(F.broadcast(folded))
        clean = F.filter(
            F.col("segs"),
            lambda s: ~F.array_contains(F.coalesce(F.col("freq_segs"), F.array()), s),
        )
        return joined.select(
            F.col(id_col),
            F.array_join(clean, " ").alias("clean_text"),
            F.size("segs").cast("long").alias("n_segments"),
            (F.size("segs") - F.size(clean)).cast("long").alias("n_dropped"),
        )
    if rebuild != "join":
        raise ValueError(f"rebuild must be 'auto'|'array'|'join', got {rebuild!r}")
    ex = base.select(
        F.col(id_col),
        F.size("segs").alias("_n_segs"),
        F.posexplode_outer("segs").alias("_pos", "seg"),  # _outer keeps 0-segment docs
    )
    marked = ex.join(
        F.broadcast(frequent.select("seg", F.lit(1).alias("_f"))), "seg", "left"
    )
    kept = F.when(F.col("_f").isNull() & F.col("seg").isNotNull(),
                  F.struct(F.col("_pos"), F.col("seg")))
    return marked.groupBy(id_col).agg(
        F.array_join(
            # collect_list skips NULLs; array_sort on (pos, seg) restores order
            F.transform(F.array_sort(F.collect_list(kept)), lambda x: x["seg"]),
            " ",
        ).alias("clean_text"),
        F.max("_n_segs").cast("long").alias("n_segments"),
        F.sum(F.when(F.col("_f") == 1, 1).otherwise(0)).cast("long").alias("n_dropped"),
    )
