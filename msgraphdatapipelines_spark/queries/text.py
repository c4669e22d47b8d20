"""Text-analysis queries (north-star) over ``documents``, oracle-checked.

All operators are single-scan Column expressions (operators.text); the
oracle mirrors them with DuckDB list lambdas.  Note DuckDB regexp_replace
needs the 'g' flag to match Spark's replace-all semantics.

r2 consolidation: quality stats, language ID, and fingerprints merged into
ONE registered query (``text_battery``) so the whole text-analysis family
lands a single driver CORRECTNESS row — all three operator groups still
run, over one scan of ``documents``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as X
from . import load, load_spread, register
from .similarity import _cos as _vec_cos
from .similarity import _norm_pos as _vec_norm_pos

# lexicon lease TTL, read at call time so the `-m race` lane's SIGKILL
# test can monkeypatch the stale transition (r15; mirrors dedup._LEASE_TTL_S)
from .. import genstore as _genstore_mod

_LEASE_TTL_S = _genstore_mod.LEASE_TTL_S

_WS = "list_filter(string_split(text, ' '), w -> w <> '')"
_ALL_MARKERS = ", ".join(
    f"'{m}'" for ms in X.LANG_MARKERS.values() for m in ms
)


def _lang_case_sql() -> tuple[str, str]:
    """(CASE chain for detected_lang, per-language score columns)."""
    score = {
        lang: f"len(list_filter({_WS}, w -> w IN ({', '.join(repr(m) for m in ms)})))"
        for lang, ms in X.LANG_MARKERS.items()
    }
    langs = list(score)
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"{score[lang]} > 0"] + [
            f"{score[lang]} >= {score[later]}" for later in langs[i + 1 :]
        ]
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case_chain = "CASE " + " ".join(cases) + " ELSE 'und' END"
    score_cols = " , ".join(f"CAST({score[lang]} AS BIGINT) AS score_{lang}" for lang in langs)
    return case_chain, score_cols


_CASE_CHAIN, _SCORE_COLS = _lang_case_sql()


@register(
    "text_battery",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, min(md5(substr(text, i, 5))) AS fp_minhash1
        FROM (SELECT doc_id, text,
                     unnest(generate_series(1, greatest(length(text) - 4, 1))) AS i
              FROM documents)
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len({_WS}) AS BIGINT) AS n_tokens,
           round(CAST(list_sum(list_transform({_WS}, w -> length(w))) AS DOUBLE)
                 / len({_WS}), 4) AS mean_token_len,
           round(CAST(len(list_filter({_WS}, w -> w IN ({_ALL_MARKERS}))) AS DOUBLE)
                 / greatest(len({_WS}), 1), 4) AS stopword_ratio,
           round(CAST(len(list_filter({_WS}, w -> regexp_matches(w, '^[0-9]+$'))) AS DOUBLE)
                 / greatest(len({_WS}), 1), 4) AS digit_token_ratio,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT)
               AS n_bpe_tokens,
           lang AS labeled_lang,
           {_CASE_CHAIN} AS detected_lang,
           {_SCORE_COLS},
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp_exact,
           sh.fp_minhash1
    FROM documents d JOIN sh ON d.doc_id = sh.doc_id
    """,
)
def text_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The text-analysis operator family over one ``documents`` scan:

    - quality-scoring signals (char/token counts, mean token length,
      stopword + digit-token ratios, BPE-ish sub-word token count) — the
      standard corpus-filtering features, all codegen;
    - heuristic language ID (per-language stopword-marker hit counts with a
      deterministic first-wins argmax; the synthetic corpus is word soup, so
      cross-engine determinism of the classifier is the point, not accuracy);
    - document fingerprints: md5 of normalized text (exact-dup key) and the
      min-md5 over char-5-shingles (1-hash MinHash, robust to local edits) —
      the O(n) dedup keys for a 100 TB corpus.

    Plan shape (r2): tokenization is materialized ONCE in a first
    projection — higher-order functions are codegen-fallback, so Catalyst
    never CSEs the repeated split+filter; without staging, every stat and
    language score re-tokenizes the document (~20× per row).  Language
    scores are likewise computed once and detected_lang derives from the
    score COLUMNS.  Same values, one tokenization.
    """
    docs = load_spread(spark, sf_dir, "documents", "doc_id")
    toked = docs.select("doc_id", "lang", "text", X.tokens("text").alias("_ws"))
    ws = F.col("_ws")
    stats = X.quality_stats("text", ws=ws)
    scores = X.lang_scores("text", ws=ws)
    mid = toked.select(
        "doc_id",
        stats["n_chars"].alias("n_chars"),
        stats["n_tokens"].alias("n_tokens"),
        stats["mean_token_len"].alias("mean_token_len"),
        stats["stopword_ratio"].alias("stopword_ratio"),
        stats["digit_token_ratio"].alias("digit_token_ratio"),
        X.bpe_token_count("text").alias("n_bpe_tokens"),
        F.col("lang").alias("labeled_lang"),
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in scores],
        X.fingerprint_exact("text").alias("fp_exact"),
        X.fingerprint_minhash1("text", 5).alias("fp_minhash1"),
    )
    return mid.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "mean_token_len",
        "stopword_ratio",
        "digit_token_ratio",
        "n_bpe_tokens",
        "labeled_lang",
        X.lang_id_from_scores(
            {lang: F.col(f"score_{lang}") for lang in X.LANG_MARKERS}
        ).alias("detected_lang"),
        *[f"score_{lang}" for lang in X.LANG_MARKERS],
        "fp_exact",
        "fp_minhash1",
    )


@register(
    "tfidf_top_terms",
    oracle="""
    WITH pairs AS (
        SELECT doc_id AS doc, term, count(*) AS tf
        FROM (SELECT doc_id,
                     unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS term
              FROM documents) t
        GROUP BY doc, term
    ),
    docfreq AS (SELECT term, count(*) AS df_ FROM pairs GROUP BY term),
    n AS (SELECT count(DISTINCT doc_id) AS nd FROM documents),
    weighted AS (
        SELECT doc, term,
               tf * (ln((CAST(nd AS DOUBLE) + 1.0) / (df_ + 1.0)) + 1.0) AS weight
        FROM pairs JOIN docfreq USING (term) CROSS JOIN n
    )
    SELECT doc AS doc_id, term, round(weight, 6) AS weight, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY doc ORDER BY weight DESC, term) AS rn
          FROM weighted) t
    WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (r4: promoted from pytest-only to a
    driver-graded row).  Scale shape (operators/text.tfidf_top_terms):
    explode → ONE (doc, term) hash agg with map-side combine; document
    frequency aggregates the already-deduplicated pairs; the idf join
    broadcasts (vocabulary ≪ corpus); top-k is a WindowGroupLimit-prunable
    ranking window.  idf = ln((N+1)/(df+1)) + 1; ties break
    lexicographically; N (corpus size) is the one model scalar collected."""
    docs = load(spark, sf_dir, "documents")
    return X.tfidf_top_terms(docs, "doc_id", "text", k=3)


@register(
    "pack_token_bins",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ),
    r AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS running
        FROM t
    )
    SELECT doc_id, n_tokens,
           CAST(running AS BIGINT) AS running_tokens,
           CAST((running - n_tokens) // 2000 AS BIGINT) AS bin_id
    FROM r
    """,
)
def pack_token_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget document packing (r4) — the LLM training-data staple:
    greedy assignment of documents, in deterministic doc_id order, to
    2000-token bins via an EXCLUSIVE prefix sum of whitespace token counts.
    The running total uses the scale-safe two-phase form
    (operators/pack.running_total: quantile buckets → one partial sum per
    bucket → offset + windowed sum within bucket), so the plan has no
    single-partition window — the oracle is the naive global-window SQL."""
    from ..operators.pack import pack_into_bins

    docs = load(spark, sf_dir, "documents")
    t = docs.select("doc_id", X.token_count("text").alias("n_tokens"))
    return pack_into_bins(t, "doc_id", "n_tokens", budget=2000)


def _pii_oracle() -> str:
    counts = ",\n           ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{kind}"
        for kind, (pat, _) in X.PII_PATTERNS.items()
    )
    scrub = "text"
    for _, (pat, repl) in X.PII_PATTERNS.items():
        scrub = f"regexp_replace({scrub}, '{pat}', '{repl}', 'g')"
    return f"""
    SELECT doc_id,
           {counts},
           {scrub} AS scrubbed
    FROM documents
    """


@register("pii_scrub_battery", oracle=_pii_oracle())
def pii_scrub_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass (r4) — email/phone/SSN patterns replaced with
    typed placeholders plus per-kind match counts, in one scan of pure
    Column expressions (operators/text.pii_scrub).  Patterns are written
    for identical semantics under Java regex (Spark) and RE2 (DuckDB):
    no lookarounds/backrefs, ASCII classes only; replacement order is
    fixed so the engines compose the same rewrites."""
    docs = load_spread(spark, sf_dir, "documents", "doc_id")
    cols = X.pii_scrub("text")
    return docs.select(
        "doc_id",
        *[cols[f"n_{k}"].alias(f"n_{k}") for k in X.PII_PATTERNS],
        cols["scrubbed"].alias("scrubbed"),
    )


@register(
    "chunk_documents",
    oracle="""
    WITH n AS (
        SELECT doc_id, text,
               greatest((length(text) - 1) // 150 + 1, 1) AS n_chunks
        FROM documents
    )
    SELECT doc_id,
           CAST(i - 1 AS BIGINT) AS chunk_idx,
           substr(text, (i - 1) * 150 + 1, 200) AS chunk_text,
           CAST(n_chunks AS BIGINT) AS n_chunks
    FROM (SELECT doc_id, text, n_chunks,
                 unnest(generate_series(1, n_chunks)) AS i
          FROM n)
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunking (r4) — RAG/window prep: 200-char
    chunks at 150-char stride (50-char overlap), every character covered,
    empty docs yield one empty chunk.  The chunk array builds per row
    (sequence+transform+substr, pure codegen) and posexplode fans out —
    the only row-count change in the plan, no shuffle
    (operators/text.chunk_text)."""
    docs = load(spark, sf_dir, "documents")
    return X.chunk_text(docs, "doc_id", "text", size=200, stride=150)


@register(
    "text_repetition_battery",
    demoted=True,  # text family driver-graded via text_battery
    oracle=f"""
    WITH w AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ),
    g AS (
        SELECT doc_id, ws,
               list_transform(generate_series(1, greatest(len(ws) - 1, 1)),
                              i -> array_to_string(ws[i:i+1], ' ')) AS g2,
               list_transform(generate_series(1, greatest(len(ws) - 2, 1)),
                              i -> array_to_string(ws[i:i+2], ' ')) AS g3
        FROM w
    )
    SELECT doc_id,
           round(1.0 - CAST(len(list_distinct(ws)) AS DOUBLE)
                       / greatest(len(ws), 1), 6) AS dup_token_ratio,
           round(CAST(coalesce(list_max(list_transform(list_distinct(ws),
                      t -> len(list_filter(ws, x -> x = t)))), 0) AS DOUBLE)
                 / greatest(len(ws), 1), 6) AS top_token_ratio,
           round(1.0 - CAST(len(list_distinct(g2)) AS DOUBLE)
                       / greatest(len(g2), 1), 6) AS dup_2gram_ratio,
           round(1.0 - CAST(len(list_distinct(g3)) AS DOUBLE)
                       / greatest(len(g3), 1), 6) AS dup_3gram_ratio
    FROM g
    """,
)
def text_repetition_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (r6,
    operators.text.repetition_signals): token/2-gram/3-gram duplication
    ratios + most-frequent-token mass, all per-row higher-order array
    expressions over ONE corpus scan — the boilerplate/degenerate-text
    filter of LLM curation pipelines.  Demoted-oracle row (text family
    stays driver-graded via text_battery)."""
    docs = load_spread(spark, sf_dir, "documents", "doc_id")
    from ..operators.text import repetition_signals, tokens

    sig = repetition_signals("text", ws=tokens("text"))
    return docs.select(
        "doc_id",
        sig["dup_token_ratio"].alias("dup_token_ratio"),
        sig["top_token_ratio"].alias("top_token_ratio"),
        sig["dup_2gram_ratio"].alias("dup_2gram_ratio"),
        sig["dup_3gram_ratio"].alias("dup_3gram_ratio"),
    )


@register(
    "text_unigram_logprob",
    demoted=True,  # text family driver-graded via text_battery
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        FROM documents
    ),
    split AS (
        SELECT doc_id,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '3' AS is_eval
        FROM documents
    ),
    counts AS (
        SELECT tok, count(*) AS c
        FROM toks JOIN split USING (doc_id)
        WHERE NOT is_eval
        GROUP BY tok
    ),
    tot AS (SELECT sum(c) AS t FROM counts),
    scored AS (
        SELECT k.doc_id,
               count(*) AS n_tokens,
               sum(CAST(floor(ln(CAST(coalesce(c.c, 1) AS DOUBLE)) * 1000000) AS BIGINT))
                   AS sum_lnc_q,
               -- CAST: sum() -> HUGEINT -> float64 in pandas (dtype-parity gate)
               CAST(sum(CASE WHEN c.c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        FROM toks k
        LEFT JOIN counts c USING (tok)
        GROUP BY k.doc_id
    )
    SELECT s.doc_id, s.n_tokens, s.n_oov,
           round(CAST(s.n_tokens
                      * CAST(floor(ln(CAST(t AS DOUBLE)) * 1000000) AS BIGINT)
                      - s.sum_lnc_q AS DOUBLE)
                 / (1000000.0 * s.n_tokens), 6) AS mean_neg_logprob
    FROM scored s, tot
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality scoring (r6): train a unigram LM
    on the TRAIN split (same deterministic md5 split as
    contamination_check) and score EVERY document's mean negative log
    probability — the perplexity-bucket filter of LLM curation pipelines
    (low = fluent/common, high = rare/garbled; buckets drive keep/drop).
    Unseen tokens smooth to count 1.

    Cross-engine determinism: per-token contributions are quantized to
    exact integers (floor(ln(count)·1e6) — same trick as the k-means
    exact-mean trainer), so the per-doc sum is order-free integer
    arithmetic and the single final division is one IEEE op.

    Scale shape: token counts = one hash agg over the exploded train side
    (the LM artifact — vocabulary ≪ corpus, reusable); scoring = one
    equi-join on the token + one per-doc agg.  Gram-frequency-bound, no
    pairs, same join family as contamination_check."""
    docs = load_spread(spark, sf_dir, "documents", "doc_id")
    toks = docs.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda w: w != "")).alias("tok"),
    )
    split = docs.select(
        "doc_id",
        (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "3").alias("is_eval"),
    )
    counts = (
        toks.join(split, "doc_id")
        .filter(~F.col("is_eval"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    tot = counts.agg(F.sum("c").alias("t"))
    lnc_q = F.floor(F.log(F.coalesce(F.col("c"), F.lit(1)).cast("double")) * 1e6).cast("long")
    scored = (
        toks.join(counts, "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(lnc_q).alias("sum_lnc_q"),
            F.sum(F.when(F.col("c").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )
    lnt_q = F.floor(F.log(F.col("t").cast("double")) * 1e6).cast("long")
    return (
        scored.crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(
                (F.col("n_tokens") * lnt_q - F.col("sum_lnc_q")).cast("double")
                / (F.lit(1e6) * F.col("n_tokens")),
                6,
            ).alias("mean_neg_logprob"),
        )
    )


_BL_W, _BL_MIN_DOCS = 4, 3


@register(
    "strip_boilerplate_segments",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_WS} AS ws FROM documents
    ),
    segd AS (
        SELECT doc_id,
               CASE WHEN len(ws) > 0 THEN
                   list_transform(
                       generate_series(0, CAST((len(ws) + {_BL_W - 1}) // {_BL_W} AS INT) - 1),
                       i -> array_to_string(
                           list_slice(ws, i * {_BL_W} + 1, i * {_BL_W} + {_BL_W}), ' '))
               ELSE CAST([] AS VARCHAR[]) END AS segs
        FROM toks
    ),
    ex AS (SELECT doc_id, unnest(segs) AS seg FROM segd),
    freq AS (
        SELECT seg FROM ex GROUP BY seg
        HAVING count(DISTINCT doc_id) >= {_BL_MIN_DOCS}
        ORDER BY count(DISTINCT doc_id) DESC, seg
        LIMIT 100000
    ),
    fl AS (SELECT coalesce(list(seg ORDER BY seg), CAST([] AS VARCHAR[])) AS fs FROM freq)
    SELECT doc_id,
           -- DuckDB array_to_string(empty) is NULL; Spark array_join(empty) is ''
           coalesce(array_to_string(list_filter(segs, s -> NOT list_contains(fs, s)), ' '), '')
               AS clean_text,
           CAST(len(segs) AS BIGINT) AS n_segments,
           CAST(len(segs) - len(list_filter(segs, s -> NOT list_contains(fs, s))) AS BIGINT)
               AS n_dropped
    FROM segd, fl
    """,
    demoted=True,  # text family already holds graded rows text_battery/pii/chunk
)
def strip_boilerplate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide boilerplate removal (the line/paragraph-dedup stage of
    public corpus pipelines — CCNet §4.1, Lee et al. 2022 — over token
    windows since this corpus has no line structure): drop every 4-token
    segment occurring in ≥3 distinct documents, rebuild documents in
    order.  One segment-hash shuffle + an O(max_frequent) broadcast; the
    rebuild is per-row codegen (operators.text.strip_frequent_segments —
    scale notes there)."""
    docs = load_spread(spark, sf_dir, "documents", "doc_id")
    return X.strip_frequent_segments(
        docs, id_col="doc_id", text_col="text", width=_BL_W, min_docs=_BL_MIN_DOCS
    )


_NB_B = 4096  # hashed feature buckets; Laplace denominator is N_c + B


@register(
    "nb_langid_classifier",
    demoted=True,  # text family already holds graded rows text_battery/pii/chunk
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % {_NB_B} AS h
        FROM (
            SELECT doc_id, unnest({_WS}) AS tok FROM documents
        )
    ),
    split AS (
        SELECT doc_id,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '3' AS is_eval
        FROM documents
    ),
    train AS (
        SELECT t.doc_id, d.lang, t.h
        FROM toks t
        JOIN split s USING (doc_id)
        JOIN documents d USING (doc_id)
        WHERE NOT s.is_eval
    ),
    counts AS (SELECT lang, h, count(*) AS c FROM train GROUP BY lang, h),
    class_stats AS (
        SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_toks
        FROM train GROUP BY lang
    ),
    ntok AS (
        SELECT d.doc_id, count(t.h) AS n_tokens
        FROM documents d LEFT JOIN toks t USING (doc_id)
        GROUP BY d.doc_id
    ),
    matched AS (
        SELECT t.doc_id, c.lang,
               sum(CAST(floor(ln(CAST(c.c + 1 AS DOUBLE)) * 1000000) AS BIGINT)) AS s
        FROM toks t JOIN counts c USING (h)
        GROUP BY t.doc_id, c.lang
    ),
    scored AS (
        SELECT n.doc_id, n.n_tokens, cs.lang AS pred,
               -- outer CAST: m.s is sum()->HUGEINT, which would ride the whole
               -- expression up to HUGEINT -> float64 (dtype-parity gate)
               CAST(CAST(floor(ln(CAST(cs.n_docs AS DOUBLE)) * 1000000) AS BIGINT)
               + coalesce(m.s, 0)
               - n.n_tokens
                 * CAST(floor(ln(CAST(cs.n_toks + {_NB_B} AS DOUBLE)) * 1000000) AS BIGINT)
                 AS BIGINT) AS score_q
        FROM ntok n
        CROSS JOIN class_stats cs
        LEFT JOIN matched m ON m.doc_id = n.doc_id AND m.lang = cs.lang
    ),
    best AS (
        SELECT doc_id, n_tokens, pred, score_q,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score_q DESC, pred ASC) AS rn
        FROM scored
    )
    SELECT b.doc_id, b.n_tokens, s.is_eval, b.pred AS pred_lang,
           (b.pred = d.lang) AS correct, b.score_q
    FROM best b JOIN split s USING (doc_id) JOIN documents d USING (doc_id)
    WHERE b.rn = 1
    """,
)
def nb_langid_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine trained hashed naive-Bayes classifier (r7): train a
    language-ID model on the md5 TRAIN split (same split as
    contamination_check / text_unigram_logprob) and score EVERY document,
    reporting the argmax class, its quantized log-posterior, and whether
    it matches the fixture label — the fastText-shaped keep/drop or
    routing classifier of LLM curation stacks, as pure DataFrame algebra.

    Model = two bounded DataFrames (k-row class rollup + ≤ k·4096
    hashed-feature counts); training is one hash agg; scoring is one
    equi-join on the feature bucket (Laplace zeros need no rows) + a
    k-rows-per-doc argmax window.  Contributions are quantized ints, so
    scores and ties are bit-identical cross-engine.  Full design notes:
    ``operators/classify.py``."""
    from ..operators import classify as C

    docs = load_spread(spark, sf_dir, "documents", "doc_id")
    toks = docs.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda w: w != "")).alias("tok"),
    ).select("doc_id", C.hashed_feature(F.col("tok"), _NB_B))
    split = docs.select(
        "doc_id",
        (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "3").alias("is_eval"),
    )
    train_toks = (
        toks.join(split, "doc_id")
        .filter(~F.col("is_eval"))
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "h")
    )
    class_stats, counts = C.nb_train(train_toks, "lang", _NB_B)
    pred = C.nb_score(toks, docs, class_stats, counts, "lang", _NB_B)
    return (
        pred.join(split, "doc_id")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "is_eval",
            F.col("pred").alias("pred_lang"),
            (F.col("pred") == F.col("lang")).alias("correct"),
            "score_q",
        )
    )


def bm25_contrib(
    docs: DataFrame, qt: DataFrame, max_df: int | None = None
) -> DataFrame:
    """Per-(query, doc, term) BM25 contributions for probe terms ``qt``
    (q_id, tok) — the joined-postings stage, factored so the df-cap bound
    is pytest-observable (r7 VERDICT item 3).

    ``max_df`` is the stop-term cap: probe terms whose document frequency
    exceeds it are dropped BEFORE the postings join — the df annotation
    rides the (small) probe side (``dfreq ⋈ broadcast(qt)``), so a
    stop-word probe term can never pull a corpus-sized postings list
    through the join: every surviving term contributes ≤ max_df posting
    rows.  This is pruning, not a different join shape — the WAND-style
    alternative (impact-ordered early termination) bounds the same term
    the same way."""
    ws = F.filter(F.split("text", " "), lambda w: w != "")
    toks = docs.select("doc_id", F.explode(ws).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # df annotates the PROBE side (broadcast): idf needs it anyway, and
    # with max_df set the fat terms die here — before any postings join
    qt2 = dfreq.join(F.broadcast(qt), "tok")
    if max_df is not None:
        qt2 = qt2.filter(F.col("df") <= max_df)
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_term = (F.col("tf") * 2.2) / (
        F.col("tf") + 1.2 * (1 - 0.75 + 0.75 * F.col("dl").cast("double") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(qt2), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "q_id",
            "doc_id",
            F.floor(idf * tf_term * F.lit(1e6)).cast("long").alias("c_q"),
        )
    )


def bm25_topk(
    docs: DataFrame, qt: DataFrame, k: int = 10, max_df: int | None = None
) -> DataFrame:
    """Top-``k`` BM25 results per probe query — contributions summed per
    (q_id, doc_id), rank-filter window (WindowGroupLimit heap)."""
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("score_q"), F.asc("doc_id"))
    return (
        bm25_contrib(docs, qt, max_df=max_df)
        .groupBy("q_id", "doc_id")
        .agg(F.sum("c_q").alias("score_q"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "doc_id", "rank", "score_q")
    )


@register(
    "bm25_search",
    demoted=True,  # retrieval family driver-graded via tfidf_top_terms / ANN rows
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_WS}) AS tok FROM documents
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
        SELECT count(*) AS n_docs,
               CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        FROM dl
    ),
    dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    qt AS (
        SELECT doc_id AS q_id, unnest(list_distinct(list_slice({_WS}, 1, 4))) AS tok
        FROM documents WHERE doc_id % 100 = 0 AND doc_id < 5000
    ),
    contrib AS (
        SELECT q.q_id, t.doc_id,
               CAST(floor(
                   ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                   * ((t.tf * 2.2)
                      / (t.tf + 1.2 * (1 - 0.75 + 0.75 * CAST(d.dl AS DOUBLE) / s.avgdl)))
                   * 1000000) AS BIGINT) AS c_q
        FROM qt q
        JOIN tf t USING (tok)
        JOIN dfreq f USING (tok)
        JOIN dl d ON d.doc_id = t.doc_id
        CROSS JOIN stats s
    ),
    scored AS (
        -- CAST: DuckDB sum(BIGINT) is HUGEINT -> pandas float64; the driver
        -- hash is representation-strict (r10 dtype-parity gate finding)
        SELECT q_id, doc_id, CAST(sum(c_q) AS BIGINT) AS score_q,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY sum(c_q) DESC, doc_id ASC) AS rank
        FROM contrib GROUP BY q_id, doc_id
    )
    SELECT q_id, doc_id, rank, score_q FROM scored WHERE rank <= 10
    """,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked lexical retrieval (r7): the keyword-search complement to
    the ANN family — score every document against a deterministic probe
    query set (first 4 distinct tokens of each ``doc_id % 100 == 0``
    document, capped at doc_id < 5000 so the probe COUNT is fixed at any
    corpus scale — retrieval cost is Σ_q Σ_t |postings(t)|, linear in the
    corpus per query; a probe set growing WITH the corpus would be the
    quadratic trap, measured and rejected in the r7 100× sweep) with
    Okapi BM25 (k1=1.2, b=0.75, query-tf ignored) and keep the top 10
    per query.  Fat posting lists: ``bm25_topk(max_df=…)`` (r8) drops
    stop-terms above a df cap on the probe side before the postings join
    — the bound is pytest-pinned; this row runs uncapped so the oracle
    covers the full scoring.

    Scale shape: tf/dl/df are single hash aggs over the exploded corpus
    (the reusable inverted-statistics artifact); the probe terms BROADCAST
    onto tf, so only postings of queried terms ever join — candidate set
    is gram-frequency-bound, never all docs; the corpus-wide stats ride a
    1-row broadcast; top-10 is a rank-filter window (WindowGroupLimit
    heap per query).  Per-term contributions quantize to ints
    (floor(·1e6)) so per-(query, doc) sums are order-free and the ranking
    replays bit-identically in the oracle."""
    docs = load_spread(spark, sf_dir, "documents", "doc_id")
    ws = F.filter(F.split("text", " "), lambda w: w != "")
    qt = (
        docs.filter((F.col("doc_id") % 100 == 0) & (F.col("doc_id") < 5000))
        .select(
            F.col("doc_id").alias("q_id"),
            F.explode(F.array_distinct(F.slice(ws, 1, 4))).alias("tok"),
        )
    )
    return bm25_topk(docs, qt, k=10)


@register(
    "text_entropy_battery",
    demoted=True,  # quality-signal family driver-graded via text_battery
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_WS}) AS tok FROM documents
    ),
    tf AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
    agg AS (
        -- n_tokens CAST: sum() -> HUGEINT -> float64 in pandas (dtype gate)
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               count(*) AS n_types,
               sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT)) AS s_q,
               max(c) AS max_tf
        FROM tf GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_types,
           round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
           round(CAST(n_tokens * CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
                      - s_q AS DOUBLE) / (1000000.0 * n_tokens), 6) AS token_entropy,
           round(CAST(max_tf AS DOUBLE) / n_tokens, 6) AS top_token_share
    FROM agg
    """,
)
def text_entropy_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution quality signals (r7): per-document Shannon
    entropy of the unigram distribution (H = ln n − Σc·ln c / n — low
    entropy ⇒ repetitive/templated text), type-token ratio, and top-token
    share — the information-theoretic complement to the Gopher repetition
    ratios (text_repetition_battery).  Defined over non-empty documents.

    One (doc, token) hash agg + one per-doc agg — two map-combinable
    shuffles, no pairs, linear in tokens.  The Σc·ln c term quantizes to
    exact ints so the per-doc sum is order-free; the final normalization
    is one IEEE division per doc, rounded to 6 places both engines."""
    docs = load_spread(spark, sf_dir, "documents", "doc_id")
    toks = docs.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda w: w != "")).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    lnc_q = F.floor(F.log(F.col("c").cast("double")) * 1e6).cast("long")
    agg = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.col("c") * lnc_q).alias("s_q"),
        F.max("c").alias("max_tf"),
    )
    lnn_q = F.floor(F.log(F.col("n_tokens").cast("double")) * 1e6).cast("long")
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_types",
        F.round(F.col("n_types").cast("double") / F.col("n_tokens"), 6).alias("ttr"),
        F.round(
            (F.col("n_tokens") * lnn_q - F.col("s_q")).cast("double")
            / (F.lit(1e6) * F.col("n_tokens")),
            6,
        ).alias("token_entropy"),
        F.round(F.col("max_tf").cast("double") / F.col("n_tokens"), 6).alias("top_token_share"),
    )


_Q13, _Q23 = repr(1 / 3), repr(2 / 3)


def _logprob_cuts(mnl: DataFrame, mode: str) -> DataFrame:
    """Tertile cutoffs (c1, c2) over mean_neg_logprob in the requested
    ``mode``: exact ``percentile`` (O(n)-memory single sort buffer — the
    100 TB hazard) or ``approx_percentile`` (one-pass bounded-memory
    sketch, accuracy 10000 — the scale default; r7 VERDICT item 2)."""
    if mode not in ("exact", "approx"):
        raise ValueError(f"mode must be 'exact' or 'approx', got {mode!r}")
    pctl = "percentile" if mode == "exact" else "approx_percentile"
    acc = "" if mode == "exact" else ", 10000"
    return mnl.agg(
        F.round(F.expr(f"{pctl}(mean_neg_logprob, {_Q13}{acc})"), 6).alias("c1"),
        F.round(F.expr(f"{pctl}(mean_neg_logprob, {_Q23}{acc})"), 6).alias("c2"),
    )


@register(
    "quality_buckets_logprob",
    demoted=True,  # quality family driver-graded via text_battery/corpus_curation
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_WS}) AS tok FROM documents
    ),
    split AS (
        SELECT doc_id,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '3' AS is_eval
        FROM documents
    ),
    counts AS (
        SELECT tok, count(*) AS c
        FROM toks JOIN split USING (doc_id)
        WHERE NOT is_eval
        GROUP BY tok
    ),
    tot AS (SELECT sum(c) AS t FROM counts),
    scored AS (
        SELECT k.doc_id,
               count(*) AS n_tokens,
               sum(CAST(floor(ln(CAST(coalesce(c.c, 1) AS DOUBLE)) * 1000000) AS BIGINT))
                   AS sum_lnc_q
        FROM toks k
        LEFT JOIN counts c USING (tok)
        GROUP BY k.doc_id
    ),
    mnl AS (
        SELECT s.doc_id,
               round(CAST(s.n_tokens
                          * CAST(floor(ln(CAST(t AS DOUBLE)) * 1000000) AS BIGINT)
                          - s.sum_lnc_q AS DOUBLE)
                     / (1000000.0 * s.n_tokens), 6) AS mean_neg_logprob
        FROM scored s, tot
    ),
    cuts AS (
        SELECT round(quantile_cont(mean_neg_logprob, {_Q13}), 6) AS c1,
               round(quantile_cont(mean_neg_logprob, {_Q23}), 6) AS c2
        FROM mnl
    )
    SELECT m.doc_id, m.mean_neg_logprob,
           CASE WHEN m.mean_neg_logprob <= c.c1 THEN 'head'
                WHEN m.mean_neg_logprob <= c.c2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM mnl m CROSS JOIN cuts c
    """,
)
def quality_buckets_logprob(
    spark: SparkSession, sf_dir: str, mode: str = "exact"
) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (r7): the keep/drop
    decision layer over text_unigram_logprob's LM scores — documents are
    assigned to tertile buckets by mean negative log-prob (head = most
    fluent).  CCNet §4.2 keeps head+middle and drops tail.

    Scale shape: NO global sort/ntile — tertile cutoffs come from ONE
    percentile aggregation, broadcast onto the scored docs for a
    comparison-only bucket assignment.  ``mode`` selects exact
    ``percentile`` (oracle-replayable) vs ``approx_percentile`` (bounded
    memory, the 100 TB default — see ``_logprob_cuts``; error band pinned
    by the ``quality_buckets_logprob_approx`` demoted row).  Cutoffs and
    scores are both rounded to 6 places before comparison, so bucket
    edges replay identically cross-engine."""
    mnl = text_unigram_logprob(spark, sf_dir).select("doc_id", "mean_neg_logprob")
    cuts = _logprob_cuts(mnl, mode)
    return mnl.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "mean_neg_logprob",
        F.when(F.col("mean_neg_logprob") <= F.col("c1"), "head")
        .when(F.col("mean_neg_logprob") <= F.col("c2"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


@register(
    "quality_buckets_logprob_approx",
    demoted=True,  # approx twin of quality_buckets_logprob (same family note)
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_WS}) AS tok FROM documents
    ),
    cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT sum(c) AS t FROM cnt),
    scored AS (
        SELECT k.doc_id, count(*) AS n_tokens,
               sum(CAST(floor(ln(CAST(c.c AS DOUBLE)) * 1000000) AS BIGINT)) AS sum_lnc_q
        FROM toks k JOIN cnt c USING (tok)
        GROUP BY k.doc_id
    ),
    mnl AS (
        SELECT doc_id,
               round(CAST(s.n_tokens
                          * CAST(floor(ln(CAST(t AS DOUBLE)) * 1000000) AS BIGINT)
                          - s.sum_lnc_q AS DOUBLE)
                     / (1000000.0 * s.n_tokens), 6) AS mean_neg_logprob
        FROM scored s, tot
    ),
    cuts AS (
        SELECT round(quantile_cont(mean_neg_logprob, {_Q13}), 6) AS c1,
               round(quantile_cont(mean_neg_logprob, {_Q23}), 6) AS c2
        FROM mnl
    ),
    buckets AS (
        SELECT CASE WHEN m.mean_neg_logprob <= c.c1 THEN 'head'
                    WHEN m.mean_neg_logprob <= c.c2 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM mnl m CROSS JOIN cuts c
    )
    SELECT bucket, count(*) AS n_docs, TRUE AS approx_count_within_5pct
    FROM buckets GROUP BY bucket
    """,
)
def quality_buckets_logprob_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx-mode error-band pin for ``quality_buckets_logprob`` (r7
    VERDICT item 2): the approx cutoffs are sketch state, so the row
    emits the EXACT per-bucket doc counts (oracle-reproducible) plus an
    in-engine BOOLEAN asserting the approx-cut bucket counts land within
    5% of the exact counts — the oracle asserts TRUE, so a sketch whose
    cutoffs drift a bucket boundary out of band fails the hash match."""
    mnl = text_unigram_logprob(spark, sf_dir).select("doc_id", "mean_neg_logprob")

    def buckets(cuts: DataFrame, alias: str) -> DataFrame:
        return (
            mnl.crossJoin(F.broadcast(cuts))
            .select(
                F.when(F.col("mean_neg_logprob") <= F.col("c1"), "head")
                .when(F.col("mean_neg_logprob") <= F.col("c2"), "middle")
                .otherwise("tail")
                .alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count("*").alias(alias))
        )

    exact = buckets(_logprob_cuts(mnl, "exact"), "n_docs")
    approx = buckets(_logprob_cuts(mnl, "approx"), "n_approx")
    return exact.join(approx, "bucket", "left").select(
        "bucket",
        "n_docs",
        (
            F.abs(F.coalesce(F.col("n_approx"), F.lit(0)) - F.col("n_docs"))
            <= 0.05 * F.col("n_docs")
        ).alias("approx_count_within_5pct"),
    )


def _bm25_ctes() -> str:
    """BM25 top-10 branch of the hybrid oracles (probe = first 4 distinct
    tokens of each doc_id < 20 document), shared by the brute-force and
    index-backed fusion rows — one rendering, two consumers."""
    return f"""WITH toks AS (
        SELECT doc_id, unnest({_WS}) AS tok FROM documents
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
        SELECT count(*) AS n_docs,
               CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        FROM dl
    ),
    dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    qt AS (
        SELECT doc_id AS qid, unnest(list_distinct(list_slice({_WS}, 1, 4))) AS tok
        FROM documents WHERE doc_id < 20
    ),
    contrib AS (
        SELECT q.qid, t.doc_id,
               CAST(floor(
                   ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                   * ((t.tf * 2.2)
                      / (t.tf + 1.2 * (1 - 0.75 + 0.75 * CAST(d.dl AS DOUBLE) / s.avgdl)))
                   * 1000000) AS BIGINT) AS c_q
        FROM qt q
        JOIN tf t USING (tok)
        JOIN dfreq f USING (tok)
        JOIN dl d ON d.doc_id = t.doc_id
        CROSS JOIN stats s
    ),
    bm AS MATERIALIZED (
        SELECT qid, doc_id AS id, rank FROM (
            SELECT qid, doc_id,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY sum(c_q) DESC, doc_id ASC) AS rank
            FROM contrib GROUP BY qid, doc_id
        ) t WHERE rank <= 10
    )"""


@register(
    "hybrid_search_rrf",
    demoted=True,  # retrieval family driver-graded via tfidf/ANN rows
    oracle=f"""
    {_bm25_ctes()},
        eq AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
           WHERE vec_id < 20 AND {_vec_norm_pos('embedding')}),
    ec AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
           WHERE {_vec_norm_pos('embedding')}),
    vec AS MATERIALIZED (
        SELECT qid, cid AS id, rank FROM (
            SELECT qid, cid,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY {_vec_cos('qv', 'cv')} DESC, cid) AS rank
            FROM eq JOIN ec ON qid <> cid
        ) t WHERE rank <= 10
    ),
    fused AS (
        SELECT coalesce(b.qid, v.qid) AS qid,
               coalesce(b.id, v.id) AS id,
               coalesce(1.0 / (60 + b.rank), 0.0)
               + coalesce(1.0 / (60 + v.rank), 0.0) AS rrf,
               b.rank AS bm25_rank, v.rank AS vec_rank
        FROM bm b FULL OUTER JOIN vec v ON b.qid = v.qid AND b.id = v.id
    )
    SELECT qid, id, rank, round(rrf, 6) AS rrf, bm25_rank, vec_rank FROM (
        SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, id ASC) AS rank
        FROM fused) t
    WHERE rank <= 10
    """,
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval (r7): fuse BM25 top-10 (probe =
    first 4 distinct tokens of each doc_id < 20 document) with exact
    cosine top-10 over the aligned embeddings (vec_id ≡ doc_id) by
    reciprocal-rank fusion, rrf = Σ 1/(60 + rank) (Cormack et al. 2009)
    — the standard production shape for RAG retrieval, where lexical and
    semantic misses are uncorrelated.

    Scale shape: the two branches keep their own documented shapes
    (gram-frequency-bound postings join; broadcast query side); fusion is
    ONE (qid, id) full-outer equi-join of two q·10-row frames + a per-qid
    rank window — cost independent of corpus size.  Ranks are ints and
    the RRF sum is a fixed two-term expression, so fusion replays
    bit-identically."""
    docs = load(spark, sf_dir, "documents")
    bm = _bm25_top10(docs)
    emb = load(spark, sf_dir, "embeddings")
    from pyspark.sql import Window

    from ..operators import similarity as S

    v = F.col("embedding").cast("array<double>")
    base = emb.select(F.col("vec_id"), v.alias("vv")).filter(
        F.sqrt(S.seq_dot(F.col("vv"), F.col("vv"))) > 0
    )
    eq = F.broadcast(
        base.filter(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("qid"), F.col("vv").alias("qv")
        )
    )
    ec = base.select(F.col("vec_id").alias("cid"), F.col("vv").alias("cv"))
    w_v = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    vec = (
        eq.crossJoin(ec)
        .filter(F.col("qid") != F.col("cid"))
        .withColumn("cos", S.cosine_seq(F.col("qv"), F.col("cv")))
        .withColumn("rank", F.row_number().over(w_v))
        .filter(F.col("rank") <= 10)
        .select("qid", F.col("cid").alias("id"), "rank")
    )
    return _rrf_fuse(bm, vec)


def _bm25_top10(docs: DataFrame) -> DataFrame:
    """BM25 top-10 per probe query (first 4 distinct tokens of each
    doc_id < 20 document) — the lexical branch shared by both hybrid
    fusion rows.  Shape notes: bm25_search (gram-frequency-bound postings
    join, fixed probe set)."""
    from pyspark.sql import Window

    ws = F.filter(F.split("text", " "), lambda w: w != "")
    toks = docs.select("doc_id", F.explode(ws).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    qt = docs.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("qid"),
        F.explode(F.array_distinct(F.slice(ws, 1, 4))).alias("tok"),
    )
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_term = (F.col("tf") * 2.2) / (
        F.col("tf") + 1.2 * (1 - 0.75 + 0.75 * F.col("dl").cast("double") / F.col("avgdl"))
    )
    w_bm = Window.partitionBy("qid").orderBy(F.desc("score_q"), F.asc("id"))
    return (
        tf.join(F.broadcast(qt), "tok")
        .join(dfreq, "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("qid", F.col("doc_id").alias("id"),
                F.floor(idf * tf_term * F.lit(1e6)).cast("long").alias("c_q"))
        .groupBy("qid", "id")
        .agg(F.sum("c_q").alias("score_q"))
        .withColumn("rank", F.row_number().over(w_bm))
        .filter(F.col("rank") <= 10)
        .select("qid", "id", "rank")
    )


def _rrf_fuse(bm: DataFrame, vec: DataFrame) -> DataFrame:
    """Reciprocal-rank fusion of two (qid, id, rank) branches —
    rrf = Σ 1/(60 + rank), top-10 per qid.  ONE (qid, id) full-outer
    equi-join of two q·10-row frames + a per-qid rank window; cost
    independent of corpus size."""
    from pyspark.sql import Window

    b = bm.select("qid", "id", F.col("rank").alias("bm25_rank"))
    x = vec.select("qid", "id", F.col("rank").alias("vec_rank"))
    fused = b.join(x, ["qid", "id"], "full_outer").select(
        "qid",
        "id",
        (
            F.coalesce(1.0 / (60 + F.col("bm25_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("vec_rank")), F.lit(0.0))
        ).alias("rrf"),
        "bm25_rank",
        "vec_rank",
    )
    w_f = Window.partitionBy("qid").orderBy(F.desc("rrf"), F.asc("id"))
    return (
        fused.withColumn("rank", F.row_number().over(w_f))
        .filter(F.col("rank") <= 10)
        .select("qid", "id", "rank", F.round("rrf", 6).alias("rrf"), "bm25_rank", "vec_rank")
    )


def _hybrid_indexed_oracle() -> str:
    from .similarity import _ivf_pq_indexed_ctes

    # _bm25_ctes() itself begins with "WITH toks AS ..."
    return f"""
    {_bm25_ctes()},
    {_ivf_pq_indexed_ctes(k=10)},
    vec AS (SELECT qid, cid AS id, rank FROM ivfpq),
    fused AS (
        SELECT coalesce(b.qid, v.qid) AS qid,
               coalesce(b.id, v.id) AS id,
               coalesce(1.0 / (60 + b.rank), 0.0)
               + coalesce(1.0 / (60 + v.rank), 0.0) AS rrf,
               b.rank AS bm25_rank, v.rank AS vec_rank
        FROM bm b FULL OUTER JOIN vec v ON b.qid = v.qid AND b.id = v.id
    )
    SELECT qid, id, rank, round(rrf, 6) AS rrf, bm25_rank, vec_rank FROM (
        SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, id ASC) AS rank
        FROM fused) t
    WHERE rank <= 10
    """


@register(
    "hybrid_search_rrf_indexed",
    # PROMOTED r9; DEMOTED r10 (r9 VERDICT items 2+8): its lexical branch
    # recomputes corpus tf/df per query — hybrid_search_rrf_served (same
    # oracle, both branches artifact-served) takes the graded slot
    demoted=True,
    oracle=_hybrid_indexed_oracle(),
)
def hybrid_search_rrf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with the vector branch served FROM THE PERSISTED
    IVF+PQ INDEX (r8, r7 VERDICT item 1): BM25 top-10 unchanged; vector
    top-10 comes from ``indexed_candidates`` — the (cid, cent, code)
    artifact written to parquet and probed with nprobe=2 + ADC scoring +
    exact rerank of the pooled 50 — instead of the brute-force corpus
    scan; RRF fusion unchanged.  The oracle replays the index build and
    probe (``_ivf_pq_indexed_ctes``), so the hash match proves the
    index-served candidates, not just the fusion.

    This closes the retrieval loop: at 100 TB the per-query vector cost
    tracks nprobe · mean-list-size (+ rerank exact cosines), NOT corpus
    size — the corpus-sized assign/encode work happens once at index
    build and is appended incrementally (``ivf_incremental_append``)."""
    from .similarity import indexed_candidates

    docs = load(spark, sf_dir, "documents")
    bm = _bm25_top10(docs)
    emb = load(spark, sf_dir, "embeddings")
    vec = indexed_candidates(spark, emb, k=10, sf_dir=sf_dir).select(
        "qid", F.col("cid").alias("id"), F.col("rank").cast("int").alias("rank")
    )
    return _rrf_fuse(bm, vec)


@register(
    "heavy_hitters_cm",
    # PROMOTED r9 (r8 VERDICT item 8): exact value-matched count-min cells
    oracle=f"""
    WITH toks AS (
        SELECT source, unnest({_WS}) AS tok FROM documents
    ),
    depths AS (SELECT unnest([0, 1, 2, 3]) AS depth),
    cells AS (
        SELECT source, depth, substr(md5(depth || '|' || tok), 1, 2) AS bucket,
               count(*) AS cnt
        FROM toks CROSS JOIN depths
        GROUP BY 1, 2, 3
    ),
    merged AS (SELECT depth, bucket, sum(cnt) AS cnt FROM cells GROUP BY 1, 2),
    exact AS (SELECT tok, count(*) AS exact_cnt FROM toks GROUP BY tok),
    top AS (SELECT tok, exact_cnt FROM exact ORDER BY exact_cnt DESC, tok LIMIT 20),
    est AS (
        -- CAST: merged.cnt is sum(BIGINT) -> HUGEINT in DuckDB, which pandas
        -- fetches as float64; the driver's value hash is representation-strict
        -- (964.0 != 964), so pin the oracle back to BIGINT (r9 verdict item 1).
        SELECT t.tok, CAST(min(m.cnt) AS BIGINT) AS cm_est
        FROM top t CROSS JOIN depths d
        JOIN merged m ON m.depth = d.depth
                     AND m.bucket = substr(md5(d.depth || '|' || t.tok), 1, 2)
        GROUP BY t.tok
    )
    SELECT t.tok, t.exact_cnt, e.cm_est, (e.cm_est >= t.exact_cnt) AS never_under
    FROM top t JOIN est e USING (tok)
    """,
)
def heavy_hitters_cm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters (r8): per-source CM cell tables over
    the corpus token stream (the mergeable frequency-rollup increment —
    the CM counterpart of the HLL/KLL rollups), merged by exact integer
    cell addition, then point estimates for the 20 most frequent tokens
    checked against exact counts.  The sketch is md5-bucketed plain rows,
    so — unlike binary HLL/KLL state — the ENTIRE estimate replays
    bit-identically in the DuckDB oracle: cm_est is value-matched, not
    tolerance-boxed, and the never-underestimates guarantee rides along
    as an asserted column.

    Scale shape: sketch build is ONE map-combinable hash agg with
    O(groups · 4 · 256) output rows regardless of corpus size; merge and
    estimate run on the model-sized cell table (broadcast).  At 100 TB
    the exact-count branch here is replaced by per-partition candidate
    generation (top-k per partition — a superset of any global heavy
    hitter); the sketch screen's no-false-negative property is what makes
    that two-phase filter sound."""
    from ..operators.sketches import build_cm_sketch, cm_estimate, merge_cm_sketches

    docs = load(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda w: w != "")
    toks = docs.select("source", F.explode(ws).alias("tok"))
    per_source = build_cm_sketch(toks, ["source"], "tok", depth=4)
    merged = merge_cm_sketches(per_source, [])
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), F.asc("tok")).limit(20)
    est = cm_estimate(merged, top.select("tok"), "tok", depth=4)
    return top.join(est, "tok").select(
        "tok",
        "exact_cnt",
        "cm_est",
        (F.col("cm_est") >= F.col("exact_cnt")).alias("never_under"),
    )


@register(
    "gopher_rules_battery",
    demoted=True,  # quality family driver-graded via text_battery/corpus_curation
    oracle=f"""
    WITH s AS (
        SELECT doc_id, {_WS} AS w FROM documents
    ),
    sig AS (
        SELECT doc_id,
               len(w) AS n_tok,
               round(CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
                     / len(w), 4) AS mean_len,
               round(CAST(len(list_filter(w, x -> regexp_matches(x, '^[0-9]+$'))) AS DOUBLE)
                     / greatest(len(w), 1), 4) AS digit_ratio,
               CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
                   / greatest(len(w), 1) AS alpha_ratio,
               len(list_filter(w, x -> x IN ({_ALL_MARKERS}))) AS n_stop,
               round(CAST(list_max(list_transform(list_distinct(w),
                         tok -> len(list_filter(w, x -> x = tok)))) AS DOUBLE)
                     / greatest(len(w), 1), 6) AS top_tok,
               round(1.0 - CAST(len(list_distinct(
                         list_transform(generate_series(1, greatest(len(w) - 2, 1)),
                                        i -> list_aggregate(w[i:i+2], 'string_agg', ' '))))
                         AS DOUBLE)
                     / greatest(len(w) - 2, 1), 6) AS dup3
        FROM s
    )
    SELECT doc_id,
           n_tok >= 20 AND n_tok <= 100000 AS pass_n_tokens,
           mean_len >= 3.0 AND mean_len <= 10.0 AS pass_mean_token_len,
           digit_ratio <= 0.2 AS pass_digit_ratio,
           alpha_ratio >= 0.8 AS pass_alpha_ratio,
           n_stop >= 2 AS pass_stopwords,
           top_tok <= 0.15 AS pass_top_token,
           dup3 <= 0.5 AS pass_dup_3gram,
           (n_tok >= 20 AND n_tok <= 100000) AND (mean_len >= 3.0 AND mean_len <= 10.0)
               AND digit_ratio <= 0.2 AND alpha_ratio >= 0.8 AND n_stop >= 2
               AND top_tok <= 0.15 AND dup3 <= 0.5 AS gopher_pass
    FROM sig
    """,
)
def gopher_rules_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText quality RULES (r9): the published keep/drop
    heuristics (Rae et al. 2021 §A1.1.1) as named per-document verdicts —
    token-count bounds, mean-token-length band, digit/alpha ratios,
    stopword presence, top-token mass, duplicate-3-gram mass — plus the
    conjunction ``gopher_pass``.  The decision layer downstream mixers
    consume; signals come from the same one-scan codegen battery as
    ``text_battery`` (shared tokenization, zero shuffles)."""
    docs = load_spread(spark, sf_dir, "documents", "doc_id")
    toked = docs.select("doc_id", X.tokens("text").alias("_ws"), F.col("text"))
    rules = X.gopher_rules("text", ws=F.col("_ws"))
    return toked.select("doc_id", *[c.alias(k) for k, c in rules.items()])


@register(
    "duplicated_spans_docs",
    demoted=True,  # dedup family driver-graded via dedup_exact/minhash rows
    oracle=f"""
    WITH base AS (
        SELECT doc_id, {_WS} AS w, len({_WS}) AS nt FROM documents
    ),
    pos AS (
        SELECT doc_id, i AS pos,
               md5(list_aggregate(w[i:i+7], 'string_agg', ' ')) AS gkey
        FROM (SELECT doc_id, w, unnest(generate_series(1, nt - 7)) AS i
              FROM base WHERE nt >= 8)
    ),
    dup AS (SELECT gkey FROM pos GROUP BY gkey HAVING count(*) >= 2),
    dpos AS (SELECT doc_id, pos FROM pos JOIN dup USING (gkey)),
    cov AS (
        SELECT doc_id, count(DISTINCT idx) AS covered
        FROM (SELECT doc_id, unnest(generate_series(pos, pos + 7)) AS idx FROM dpos)
        GROUP BY doc_id
    ),
    nd AS (SELECT doc_id, count(*) AS n_dup FROM dpos GROUP BY doc_id)
    SELECT b.doc_id,
           CAST(nt AS BIGINT) AS n_tokens,
           CAST(greatest(nt - 7, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup_positions,
           round(CAST(coalesce(n_dup, 0) AS DOUBLE) / greatest(nt - 7, 1), 6)
               AS dup_ngram_ratio,
           CAST(coalesce(covered, 0) AS BIGINT) AS covered_tokens,
           round(CAST(coalesce(covered, 0) AS DOUBLE) / greatest(nt, 1), 6)
               AS dup_token_fraction
    FROM base b LEFT JOIN nd USING (doc_id) LEFT JOIN cov USING (doc_id)
    """,
)
def duplicated_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-substring coverage (r9): sliding 8-gram
    positions whose gram occurs ≥2 times corpus-wide, per-doc duplicated-
    position counts and token-coverage fraction (interval-union fold, no
    width-× explode) — the Lee et al. 2022 exact-substring dedup signal.
    The oracle computes coverage by exploding covered indices; the engine
    folds sorted intervals — same integers, different plan, which is the
    point (the fold keeps the doc-keyed shuffle O(dup positions))."""
    docs = load_spread(spark, sf_dir, "documents", "doc_id")
    return X.duplicated_span_stats(docs, "doc_id", "text", n=8, min_count=2)


@register(
    "dedup_remove_spans_docs",  # promoted r11: exact-substring span REMOVAL, driver-graded
    oracle=f"""
    WITH base AS (
        SELECT doc_id, {_WS} AS w, len({_WS}) AS nt FROM documents
    ),
    pos AS (
        SELECT doc_id, i AS pos,
               md5(list_aggregate(w[i:i+7], 'string_agg', ' ')) AS gkey
        FROM (SELECT doc_id, w, unnest(generate_series(1, nt - 7)) AS i
              FROM base WHERE nt >= 8)
    ),
    g AS (
        SELECT gkey, min(doc_id * 1000000 + pos) AS keepk
        FROM pos GROUP BY gkey HAVING count(*) >= 2
    ),
    red AS (
        SELECT p.doc_id, p.pos FROM pos p JOIN g USING (gkey)
        WHERE p.doc_id * 1000000 + p.pos <> g.keepk
    ),
    cov AS (
        SELECT DISTINCT doc_id, idx
        FROM (SELECT doc_id, unnest(generate_series(pos, pos + 7)) AS idx FROM red)
    ),
    toks AS (
        SELECT doc_id, unnest(w) AS tok, unnest(generate_series(1, nt)) AS i
        FROM base
    ),
    clean AS (
        SELECT t.doc_id,
               string_agg(t.tok, ' ' ORDER BY t.i) AS text_clean,
               count(*) AS n_kept
        FROM toks t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.idx = t.i
        WHERE c.idx IS NULL
        GROUP BY t.doc_id
    )
    SELECT b.doc_id,
           CAST(nt AS BIGINT) AS n_tokens,
           CAST(nt - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
           coalesce(text_clean, '') AS text_clean
    FROM base b LEFT JOIN clean USING (doc_id)
    """,
)
def dedup_remove_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup TRANSFORM (r10): every token covered by a
    corpus-duplicated 8-gram occurrence is REMOVED except the canonical
    first occurrence (min ``doc_id·10⁶+pos`` — a total order both engines
    share), producing the cleaned corpus Lee et al. 2022 train on — the
    destructive twin of the duplicated_spans_docs STATS row.  The oracle
    rebuilds each document by exploding covered indices and re-joining
    kept tokens in order; the engine filters per-row arrays against the
    per-doc redundant-start list — same text, different plan (the engine
    never explodes window-width rows or shuffles token text)."""
    docs = load_spread(spark, sf_dir, "documents", "doc_id")
    return X.remove_duplicated_spans(docs, "doc_id", "text", n=8, min_count=2)


# ---------------------------------------------------------------------------
# r9: the STANDING LEXICAL INDEX — the BM25 twin of the ANN standing
# artifact (queries/similarity.ensure_standing_index): postings/docstats/
# termstats persisted once per corpus, every lexical retrieval after
# first touch is pure serve.


def lexicon_root(sf_dir: str, variant: str = "full") -> str:
    """Deterministic artifact location, keyed on corpus identity (path +
    documents.parquet size/mtime fingerprint) — a regenerated corpus can
    never silently serve stale postings.  ``variant`` isolates lifecycle
    rehearsal roots (e.g. the erasure row) from the shared serving
    artifact, the prefix_index_root discipline."""
    import hashlib
    import os
    import tempfile

    p = os.path.join(sf_dir, "documents.parquet")
    parts = []
    if os.path.isdir(p):
        for root_, _, files in sorted(os.walk(p)):
            for fn in sorted(files):
                st = os.stat(os.path.join(root_, fn))
                parts.append(f"{fn}:{st.st_size}:{st.st_mtime_ns}")
    else:
        st = os.stat(p)
        parts.append(f"{st.st_size}:{st.st_mtime_ns}")
    key = hashlib.md5(
        # v3 (r13): generational layout — bumping the key retires v2
        # meta.json-commit artifacts instead of carrying a legacy reader.
        # v4 (r17): range-partitioned + zonemapped postings — old hash-
        # partitioned artifacts rebuild rather than serving unprunable
        # layouts (the serve falls back gracefully, but a fresh root keeps
        # the fleet uniform)
        f"{os.path.abspath(sf_dir)}|{'|'.join(parts)}|lex|{variant}|v4".encode()
    ).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), f"msgdp_lex_{key}")


def _lex_batch_ids(spark: SparkSession, root: str, table: str = "tf") -> list[int]:
    """Sorted batch ids under ``batches/<table>`` via the Hadoop FS API
    (r10, r9 VERDICT item 7: ``os.listdir`` breaks the moment the root
    is an object store — every store probe goes through the same FS
    layer as the snapshot sinks)."""
    from .. import sinks

    return sinks._list_numbered_dirs(spark, f"{root}/batches/{table}", "batch_id=")


def lexicon_append_batch(
    spark: SparkSession, root: str, docs: DataFrame, bid: int | None = None
) -> int:
    """Append a NEW-document batch to the lexicon's grow-only store (r9;
    r13 staged-pair publish): per-batch tf and dl increments land under
    ``batches/{tf,dl}/batch_id=K`` — the ann_index_stream layout, so
    ingestion never rewrites existing postings.  Batches become servable
    at the next ``lexicon_compact``.

    ``bid`` (r13) names the batch deterministically (e.g. the streaming
    micro-batch id), making the append IDEMPOTENT under checkpoint
    replay: a fully-published batch id no-ops.  Both tables stage under
    one uuid dir and rename into place half-by-half (exists-wins) — a
    crash between the renames leaves a HALF-published batch that
    ``lexicon_compact`` skips (full pairs only) and a same-bid re-append
    completes; the torn-directory window of the old direct
    ``mode("overwrite")`` writes is gone.  Append-only corpus contract:
    a re-ingested doc_id is the caller's upsert problem (route through
    the SCD sinks), not the lexicon's."""
    import uuid

    from .. import sinks

    fs, _, jvm = sinks._fs_for(spark, root)
    hpath = jvm.org.apache.hadoop.fs.Path
    existing = _lex_batch_ids(spark, root)
    k = bid if bid is not None else ((existing[-1] + 1) if existing else 0)
    dst_tf = hpath(f"{root}/batches/tf/batch_id={k}")
    dst_dl = hpath(f"{root}/batches/dl/batch_id={k}")
    if fs.exists(dst_tf) and fs.exists(dst_dl):
        return k  # replay of a fully-published batch
    ws = F.filter(F.split("text", " "), lambda w: w != "")
    toks = docs.select("doc_id", F.explode(ws).alias("tok"))
    stage = f"{root}/stage.append.{uuid.uuid4().hex[:8]}"
    toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf")).write.parquet(
        f"{stage}/tf"
    )
    toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl")).write.parquet(
        f"{stage}/dl"
    )
    fs.mkdirs(hpath(f"{root}/batches/tf"))
    fs.mkdirs(hpath(f"{root}/batches/dl"))
    if fs.exists(dst_tf) or not fs.rename(hpath(f"{stage}/tf"), dst_tf):
        pass  # racer/replayer already published this half
    if fs.exists(dst_dl) or not fs.rename(hpath(f"{stage}/dl"), dst_dl):
        pass
    fs.delete(hpath(stage), True)
    return k


def _lex_full_bids(spark: SparkSession, root: str) -> list[int]:
    """Batch ids published in BOTH tables — compact folds full pairs
    only; a half-published batch (appender crashed between renames) is
    invisible until its same-bid re-append completes."""
    return sorted(
        set(_lex_batch_ids(spark, root, "tf")) & set(_lex_batch_ids(spark, root, "dl"))
    )


def _lex_read_meta(fs, hpath, gen: str) -> dict:
    import json

    stream = fs.open(hpath(f"{gen}/meta.json"))
    try:
        return json.loads(bytes(stream.readAllBytes()).decode("ascii"))
    finally:
        stream.close()


def lexicon_compact(
    spark: SparkSession, root: str, _test_hook_before_commit=None
) -> dict:
    """Publish the servable lexicon from all fully-appended batches as
    ONE committed generation (r13, r12 VERDICT item 3 — the meta.json
    commit discipline retired for the shared ``genstore`` protocol the
    prefix-gram index pioneered): postings REPARTITIONED BY TERM +
    sorted within partitions (probe ``tok IN`` pushdown skips row groups
    — the parquet analog of reading only the queried postings lists),
    docstats, termstats and the exact-integer meta {n_docs, sum_dl,
    n_batches} all staged under one uuid dir and committed by ONE
    ``_commit`` marker rename.  A crash anywhere mid-compact leaves the
    previous generation fully live; a reader can never observe postings
    and meta from different rebuilds (the torn-commit window the old
    three-snapshot-flips-then-meta sequence left open).

    The generation's ``_folded`` manifest records the folded batch ids:
    a compact whose visible batch set equals the live generation's
    manifest NO-OPS (returns the live meta — rebuilds are corpus-sized,
    so idempotent re-compacts shouldn't pay one), and replayed appends
    stay idempotent against it.  The ``_compacting`` lease serializes
    rebuilds (heartbeat-renewed; stale leases from crashed compactors
    are ignored)."""
    import json

    from .. import genstore as _gs
    from .. import sinks

    fs, _, jvm = sinks._fs_for(spark, root)
    hpath = jvm.org.apache.hadoop.fs.Path
    with _gs.compaction_lease(fs, hpath, root, ttl_s=_LEASE_TTL_S):
        bids = _lex_full_bids(spark, root)
        if not bids:
            raise FileNotFoundError(f"compact before append: no batches at {root}")
        # erasure manifest (lexicon_forget): its batch-dir names join the
        # no-op key, so a forget always forces a real rebuild and every
        # rebuild re-applies the full manifest (replayed appends of an
        # erased doc cannot resurrect it)
        fdirs = (
            sorted(
                st.getPath().getName()
                for st in fs.listStatus(hpath(f"{root}/_forgotten"))
                if st.isDirectory()
            )
            if fs.exists(hpath(f"{root}/_forgotten"))
            else []
        )
        live = _gs.current_gen(fs, hpath, root)
        folded_all = set(_gs.gen_folded_bids(fs, hpath, live)) if live else set()
        folded_bids = {n for n in folded_all if not n.startswith("_fg_")}
        folded_fg = {n[len("_fg_"):] for n in folded_all if n.startswith("_fg_")}
        if (
            live is not None
            and {str(b) for b in bids} == folded_bids
            and set(fdirs) == folded_fg
        ):
            return _lex_read_meta(fs, hpath, live)  # nothing new: no-op
        tf = spark.read.parquet(*[f"{root}/batches/tf/batch_id={b}" for b in bids])
        dl = spark.read.parquet(*[f"{root}/batches/dl/batch_id={b}" for b in bids])
        if fdirs:
            forgotten = spark.read.option("recursiveFileLookup", "true").parquet(
                f"{root}/_forgotten"
            )
            tf = tf.join(F.broadcast(forgotten), "doc_id", "left_anti")
            dl = dl.join(F.broadcast(forgotten), "doc_id", "left_anti")
        import uuid

        stage = f"{root}/stage.compact.{uuid.uuid4().hex[:8]}"
        # r17 OPT (r16 VERDICT item 8): RANGE-partition the postings by
        # term instead of hash — each file then holds a contiguous token
        # range, so the committed ``_zonemap`` manifest can skip whole
        # FILES under the serve probe's ``tok IN`` (hash partitioning
        # spreads every file's [min, max] across the alphabet, making
        # file-level stats useless; row-group skipping inside opened
        # files worked either way via the within-partition sort).
        tf.repartitionByRange(F.col("tok")).sortWithinPartitions("tok").write.parquet(
            f"{stage}/postings"
        )
        sinks.build_zonemap(spark, f"{stage}/postings", ["tok"])
        dl.write.parquet(f"{stage}/docstats")
        tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df")).write.parquet(
            f"{stage}/termstats"
        )
        agg = dl.agg(F.count(F.lit(1)), F.sum("dl")).collect()[0]
        meta = {"n_docs": int(agg[0]), "sum_dl": int(agg[1]), "n_batches": len(bids)}
        out = fs.create(hpath(f"{stage}/meta.json"), True)
        try:
            out.write(bytearray(json.dumps(meta).encode("ascii")))
        finally:
            out.close()
        fs.mkdirs(hpath(f"{stage}/_folded"))
        for b in bids:
            _gs.marker_commit(fs, hpath, f"{stage}/_folded/{b}")
        for n in fdirs:
            _gs.marker_commit(fs, hpath, f"{stage}/_folded/_fg_{n}")
        if _test_hook_before_commit is not None:
            # the `-m race` lane's SIGKILL window (r15): fully staged,
            # commit marker not yet written
            _test_hook_before_commit()
        _gs.commit_generation(
            fs, hpath, root, stage, _gs.next_gen_name(fs, hpath, root)
        )
        # GC: keep live + previous generations (a reader that resolved the
        # old generation just before commit still has its files)
        for g in _gs.committed_gens(fs, hpath, root)[:-2]:
            fs.delete(hpath(f"{root}/{g}"), True)
        # non-authoritative convenience copy at the root: build-once
        # observability (tests witness its mtime) and ad-hoc inspection;
        # readers resolve the GENERATION's meta, never this file
        tmp = hpath(f"{root}/meta.json.tmp.{uuid.uuid4().hex[:6]}")
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(json.dumps(meta).encode("ascii")))
        finally:
            out.close()
        fs.delete(hpath(f"{root}/meta.json"), False)
        fs.rename(tmp, hpath(f"{root}/meta.json"))
        return meta


def lexicon_forget(spark: SparkSession, root: str, doc_ids: list) -> dict:
    """GDPR erasure for the STANDING lexicon (r13, the prefix-gram
    twin — see ``dedup.prefix_index_forget`` for the full rationale):
    record the ids durably under ``{root}/_forgotten`` (every later
    compact re-applies the manifest, so replayed appends cannot
    resurrect an erased doc; the manifest dirs join the compact's no-op
    key, so the forget always forces a real rebuild), then immediately
    republish a generation without the docs — postings, docstats,
    termstats AND the exact-integer corpus stats (n_docs, sum_dl) all
    exclude them, so BM25 idf/avgdl stop reflecting erased content too.
    Permanent for the artifact; cost is one compact."""
    import uuid

    ids = spark.createDataFrame([(int(i),) for i in doc_ids], "doc_id: long")
    ids.coalesce(1).write.parquet(f"{root}/_forgotten/ids_{uuid.uuid4().hex[:8]}")
    meta = lexicon_compact(spark, root)
    meta["forgotten"] = len(doc_ids)
    return meta


def read_lexicon(spark: SparkSession, root: str):
    """(postings, docstats, termstats, meta) — the live generation's
    servable view: one committed-generation resolve + one tiny json read
    (through the Hadoop FS API, so the root may be an object-store
    prefix), no corpus work.  Generations are immutable once committed,
    so a plan built here keeps a consistent (postings, meta) pair even
    if a compact publishes meanwhile."""
    from .. import genstore as _gs
    from .. import sinks

    fs, _, jvm = sinks._fs_for(spark, root)
    hpath = jvm.org.apache.hadoop.fs.Path
    gen = _gs.current_gen(fs, hpath, root)
    if gen is None:
        raise FileNotFoundError(f"no committed lexicon generation under {root}")
    return (
        spark.read.parquet(f"{gen}/postings"),
        spark.read.parquet(f"{gen}/docstats"),
        spark.read.parquet(f"{gen}/termstats"),
        _lex_read_meta(fs, hpath, gen),
    )


def ensure_standing_lexicon(spark: SparkSession, sf_dir: str, docs: DataFrame | None = None):
    """Build-at-most-once standing lexicon for a warehouse corpus:
    first touch ingests the whole ``documents`` table as batch 0 and
    compacts; afterwards every call is a pure generation resolve
    (``read_lexicon``).  Incremental growth goes through
    ``lexicon_append_batch`` + ``lexicon_compact`` on the same root —
    the ANN standing-index maintenance pattern applied to the lexical
    branch."""
    from .. import genstore as _gs
    from .. import sinks

    root = lexicon_root(sf_dir)
    fs, _, jvm = sinks._fs_for(spark, root)
    hpath = jvm.org.apache.hadoop.fs.Path
    if _gs.current_gen(fs, hpath, root) is None:
        if docs is None:
            docs = load_spread(spark, sf_dir, "documents", "doc_id")
        lexicon_append_batch(spark, root, docs, bid=0)  # bid 0: replay no-op
        try:
            lexicon_compact(spark, root)
        except RuntimeError as e:
            if "compact already in progress" not in str(e):
                raise
            # a RACING builder holds the compaction lease over the same
            # single batch: wait its commit out and serve its generation
            # (identical content — both compacts fold exactly batch 0);
            # if it crashed pre-commit its lease goes stale and we build
            _gs.wait_leases_clear(fs, hpath, root)
            if _gs.current_gen(fs, hpath, root) is None:
                lexicon_compact(spark, root)
    return read_lexicon(spark, root)


def bm25_topk_served(
    spark: SparkSession,
    sf_dir: str,
    qt: DataFrame,
    k: int = 10,
    max_df: int | None = None,
    isin_pushdown_cap: int = 1024,
) -> DataFrame:
    """BM25 top-``k`` served FROM THE STANDING LEXICON: no corpus scan, no
    tf/dl/df recomputation — the probe joins the persisted postings.

    When the distinct probe-term set is small (≤ ``isin_pushdown_cap`` —
    bounded model-side state, like the ANN centroid collect), it is
    collected and pushed as ``tok IN (…)`` into the postings SCAN, so the
    term-partitioned, term-sorted parquet skips every row group holding
    unqueried terms — the 100 TB shape where serve I/O tracks the probed
    postings lists, not the corpus.  Larger probe sets fall back to the
    plain broadcast join (still postings-bounded after the shuffle-free
    probe-side df cap)."""
    ensure_standing_lexicon(spark, sf_dir)
    return _bm25_from_lexicon(
        spark,
        lexicon_root(sf_dir),
        qt,
        k=k,
        max_df=max_df,
        isin_pushdown_cap=isin_pushdown_cap,
    )


def _bm25_from_lexicon(
    spark: SparkSession,
    root: str,
    qt: DataFrame,
    k: int = 10,
    max_df: int | None = None,
    isin_pushdown_cap: int = 1024,
) -> DataFrame:
    """Scoring core over an explicit lexicon root (factored so the
    incremental-maintenance tests can serve from roots they appended)."""
    from pyspark.sql import Window

    from .. import genstore as _gs
    from .. import sinks

    fs, _, jvm = sinks._fs_for(spark, root)
    hpath = jvm.org.apache.hadoop.fs.Path
    gen = _gs.current_gen(fs, hpath, root)
    if gen is None:
        raise FileNotFoundError(f"no committed lexicon generation under {root}")
    dl = spark.read.parquet(f"{gen}/docstats")
    dfreq = spark.read.parquet(f"{gen}/termstats")
    meta = _lex_read_meta(fs, hpath, gen)
    n_docs, sum_dl = meta["n_docs"], meta["sum_dl"]
    terms = [r["tok"] for r in qt.select("tok").distinct().limit(isin_pushdown_cap + 1).collect()]
    if len(terms) <= isin_pushdown_cap:
        # r17 OPT (r16 VERDICT item 8): serve through the generation's
        # committed zonemap — only postings FILES whose [min, max] token
        # range intersects the probe set are opened (the range-partitioned
        # layout makes file stats selective); the residual isin filter
        # keeps semantics exact and row-group skipping still applies
        # inside opened files.  Generations are immutable, so the cached
        # manifest rows never go stale; missing manifest (pre-v4 root)
        # degrades to the plain filtered scan.
        rows = sinks._zonemap_rows_cached(spark, f"{gen}/postings")
        if rows is not None:
            postings = sinks.scan_pruned_in(
                spark, f"{gen}/postings", "tok", terms, _manifest_rows=rows
            )
        else:
            postings = spark.read.parquet(f"{gen}/postings").filter(
                F.col("tok").isin(terms)
            )
    else:
        postings = spark.read.parquet(f"{gen}/postings")
    qt2 = dfreq.join(F.broadcast(qt), "tok")
    if max_df is not None:
        qt2 = qt2.filter(F.col("df") <= max_df)
    avgdl = F.lit(sum_dl).cast("double") / F.lit(n_docs)
    idf = F.log(1 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_term = (F.col("tf") * 2.2) / (
        F.col("tf") + 1.2 * (1 - 0.75 + 0.75 * F.col("dl").cast("double") / avgdl)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score_q"), F.asc("doc_id"))
    return (
        postings.join(F.broadcast(qt2), "tok")
        .join(dl, "doc_id")
        .select("q_id", "doc_id", F.floor(idf * tf_term * F.lit(1e6)).cast("long").alias("c_q"))
        .groupBy("q_id", "doc_id")
        .agg(F.sum("c_q").alias("score_q"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "doc_id", "rank", "score_q")
    )


from . import DEMOTED as _DEMOTED  # noqa: E402 — late: bm25_search registers above


@register(
    "bm25_search_served",
    demoted=True,  # retrieval family driver-graded via hybrid_search_rrf_indexed
    oracle=_DEMOTED["bm25_search"].oracle,
)
def bm25_search_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 served from the STANDING LEXICON (r9): identical ranking to
    ``bm25_search`` — the oracle is literally the same from-scratch SQL,
    so the hash match proves the persisted postings/docstats/termstats
    artifact serves the exact values a full recomputation produces —
    with the steady-state plan: probe terms pushed into the
    term-partitioned postings scan (row-group skipping), df cap and
    corpus stats applied from the persisted artifact, zero corpus-sized
    work after first touch."""
    docs = load_spread(spark, sf_dir, "documents", "doc_id")
    ws = F.filter(F.split("text", " "), lambda w: w != "")
    qt = (
        docs.filter((F.col("doc_id") % 100 == 0) & (F.col("doc_id") < 5000))
        .select(
            F.col("doc_id").alias("q_id"),
            F.explode(F.array_distinct(F.slice(ws, 1, 4))).alias("tok"),
        )
    )
    return bm25_topk_served(spark, sf_dir, qt, k=10)


def _ensure_forgotten_lexicon(spark: SparkSession, sf_dir: str) -> str:
    """Build-full → FORGET rehearsal lexicon (r13): the erasure
    lifecycle under one marker — ingest the whole corpus as batch 0,
    compact, then ``lexicon_forget`` the deterministic set
    ``doc_id % 50 == 25`` (disjoint from the % 100 == 0 probe docs)."""
    from .. import genstore as _gs
    from .. import sinks

    root = lexicon_root(sf_dir, variant="forgotten")
    fs, _, jvm = sinks._fs_for(spark, root)
    hpath = jvm.org.apache.hadoop.fs.Path
    marker = f"{root}/_fgt_ready"
    if not fs.exists(hpath(marker)):
        docs = load_spread(spark, sf_dir, "documents", "doc_id")
        lexicon_append_batch(spark, root, docs, bid=0)
        lexicon_compact(spark, root)
        ids = [
            r["doc_id"]
            for r in docs.filter(F.col("doc_id") % 50 == 25)
            .select("doc_id")
            .collect()
        ]
        lexicon_forget(spark, root, ids)
        _gs.marker_commit(fs, hpath, marker)
    return root


@register(
    "bm25_search_forgotten",
    demoted=True,  # erasure-lifecycle twin of bm25_search_served
    # the from-scratch BM25 SQL with the CORPUS side (first FROM
    # documents = the toks CTE) excluding the erased set; the query side
    # (% 100 == 0 probes) is disjoint from it by construction
    oracle=_DEMOTED["bm25_search"].oracle.replace(
        "FROM documents", "FROM documents WHERE doc_id % 50 <> 25", 1
    ),
)
def bm25_search_forgotten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13: GDPR erasure must reach the STANDING lexicon — after
    ``lexicon_forget``, BM25 served from the republished generation
    matches the from-scratch ranking over the corpus WITHOUT the erased
    docs: their postings are physically gone AND the corpus statistics
    (n_docs, sum_dl → idf, avgdl) exclude them, so erased content stops
    influencing every ranking, not just its own rows.  The erasure
    manifest re-applies on every later compact (replayed appends cannot
    resurrect), and its batch dirs join the compact's no-op key."""
    root = _ensure_forgotten_lexicon(spark, sf_dir)
    docs = load_spread(spark, sf_dir, "documents", "doc_id")
    ws = F.filter(F.split("text", " "), lambda w: w != "")
    qt = (
        docs.filter((F.col("doc_id") % 100 == 0) & (F.col("doc_id") < 5000))
        .select(
            F.col("doc_id").alias("q_id"),
            F.explode(F.array_distinct(F.slice(ws, 1, 4))).alias("tok"),
        )
    )
    return _bm25_from_lexicon(spark, root, qt, k=10)


@register(
    "hybrid_search_rrf_served",
    # PROMOTED r10 (r9 VERDICT items 3+8): the standing-artifact flagship —
    # BOTH retrieval branches served from persisted indexes.  Takes the
    # graded slot of hybrid_search_rrf_indexed (demoted r10), whose lexical
    # branch recomputed corpus tf/df per query.  Same oracle as the indexed
    # row: both branch artifacts replay bit-identically in DuckDB.
    oracle=_hybrid_indexed_oracle(),
)
def hybrid_search_rrf_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval fully SERVED FROM STANDING ARTIFACTS (r10, r9
    VERDICT item 3): the lexical branch probes the persisted BM25 lexicon
    (``bm25_topk_served`` — probe terms pushed as ``tok IN`` into the
    term-partitioned postings scan; corpus stats from the persisted
    ``meta.json``), the vector branch probes the standing IVF+PQ index
    (``indexed_candidates`` — nprobe·list-size + exact rerank-50), and the
    two (qid, id, rank) frames fuse by reciprocal rank.  Ranking is
    bit-identical to ``hybrid_search_rrf_indexed`` (same oracle), but the
    per-query cost now has ZERO corpus-sized aggregations on EITHER
    branch — the steady-state shape a 100 TB RAG deployment runs: every
    term of the cost tracks probed postings lists / probed centroid lists,
    never the corpus.  Probe = first 4 distinct tokens of each doc_id < 20
    document, matching the indexed row."""
    from .. import genstore as _gs
    from .. import sinks
    from .similarity import (
        _memo_serve_plan,
        ensure_standing_index,
        indexed_candidates,
        standing_index_root,
    )

    # r16 OPT: plan memo keyed by BOTH artifact states (ANN snapshot
    # version via the cache key, lexicon generation via the tag) — the
    # composed serve plan is ~2× the single-branch py4j build cost; see
    # similarity._memo_serve_plan (execution still runs per call).
    emb = load(spark, sf_dir, "embeddings")
    ensure_standing_index(spark, sf_dir, emb)
    ensure_standing_lexicon(spark, sf_dir)
    ann_root = standing_index_root(sf_dir)
    version = sinks._read_latest_version(spark, f"{ann_root}/snapshot")
    lroot = lexicon_root(sf_dir)
    fs, _, jvm = sinks._fs_for(spark, lroot)
    gen = _gs.current_gen(fs, jvm.org.apache.hadoop.fs.Path, lroot)

    def _build():
        docs = load(spark, sf_dir, "documents")
        ws = F.filter(F.split("text", " "), lambda w: w != "")
        qt = docs.filter(F.col("doc_id") < 20).select(
            F.col("doc_id").alias("q_id"),
            F.explode(F.array_distinct(F.slice(ws, 1, 4))).alias("tok"),
        )
        bm = bm25_topk_served(spark, sf_dir, qt, k=10).select(
            F.col("q_id").alias("qid"), F.col("doc_id").alias("id"), "rank"
        )
        vec = indexed_candidates(spark, emb, k=10, sf_dir=sf_dir).select(
            "qid", F.col("cid").alias("id"), F.col("rank").cast("int").alias("rank")
        )
        return _rrf_fuse(bm, vec)

    return _memo_serve_plan(
        spark, ann_root, version, f"q:hybrid_search_rrf_served:{gen}", _build
    )


@register(
    "cdc_chunk_documents",
    demoted=True,  # chunking family driver-graded via chunk_documents
    oracle=f"""
    WITH base AS (
        SELECT doc_id, {_WS} AS w, len({_WS}) AS nt FROM documents
    ),
    b AS (
        SELECT doc_id, w, nt,
               list_filter(generate_series(8, nt - 1),
                           i -> substr(md5(array_to_string(w[i-7:i], ' ')), 1, 1) = '0')
                   AS bounds
        FROM base
    ),
    c AS (
        SELECT doc_id, w, nt,
               list_prepend(1, list_transform(bounds, x -> x + 1)) AS starts,
               list_append(bounds, nt) AS ends
        FROM b
    ),
    z AS (
        SELECT doc_id, w, nt,
               unnest(starts) AS s, unnest(ends) AS e,
               unnest(generate_series(1, len(starts))) AS i
        FROM c
    )
    SELECT doc_id,
           CAST(nt AS BIGINT) AS n_tokens,
           CAST(i - 1 AS BIGINT) AS chunk_idx,
           array_to_string(w[s:e], ' ') AS chunk_text,
           md5(array_to_string(w[s:e], ' ')) AS chunk_hash
    FROM z
    """,
)
def cdc_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (r10): Rabin-style token-window hash
    boundaries (zero leading md5 nibble over the trailing 8-token
    window, P=1/16) — the edit-stable chunking that makes chunk-hash
    dedup and incremental RAG re-indexing local to the edit, vs the
    fixed-size chunker whose downstream chunks all shift
    (``chunk_documents``).  Boundaries, chunk texts, AND content hashes
    replay bit-identically in the oracle because the boundary predicate
    is the same md5 both engines evaluate."""
    docs = load_spread(spark, sf_dir, "documents", "doc_id")
    return X.content_defined_chunks(docs, "doc_id", "text", w=8)
