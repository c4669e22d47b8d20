"""Generate a NATURAL-statistics document corpus for prefix-join sweeps.

Usage: python tools/make_zipf_docs.py [dst_dir] [n_docs] [seed]
       (defaults: .tmp/zipf1x  5000  7)

The driver fixture's text is TEMPLATED — its word-vocabulary is CLOSED
(931 bigrams at sf0.1), so every gram is frequent and prefix filtering
degenerates (the measured r7 caveat in PERF.md).  Real corpora are not
like that: vocabulary grows with the data (Heaps' law, V ≈ K·N^β) and
word frequencies are Zipfian, so the rarest-first prefix ordering keeps
candidate counts near-linear.  This generator produces that shape:

- vocabulary size scales as ``44 · (total_words)**0.5`` (Heaps, β=0.5,
  K=44 — English-ish constants);
- word draws are Zipf(s=1.1) over that vocabulary (numpy.random.zipf is
  unbounded; draws are rejection-capped to the vocab size);
- doc lengths uniform 30..79 words;
- 2% of docs are planted NEAR-DUPS of an earlier doc (one word in ~12
  replaced) so the join has true pairs to find at every scale.

Output schema matches testdata documents.parquet (doc_id, text, lang,
source, n_chars) so the standing prefix-gram index functions run
unchanged.  Deterministic per (n_docs, seed).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DST = sys.argv[1] if len(sys.argv) > 1 else ".tmp/zipf1x"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
SEED = int(sys.argv[3]) if len(sys.argv) > 3 else 7

rng = np.random.default_rng(SEED)
lens = rng.integers(30, 80, size=N)
total_words = int(lens.sum())
vocab_size = max(1000, int(44 * total_words**0.5))

# Zipf draws capped to the vocabulary (redraw the tail mass uniformly —
# it is < 2% of draws at s=1.1 with these sizes, and keeps ranks exact)
draws = rng.zipf(1.1, size=total_words)
over = draws > vocab_size
draws[over] = rng.integers(1, vocab_size + 1, size=int(over.sum()))

words = np.char.add("w", draws.astype("U8"))
offsets = np.concatenate(([0], np.cumsum(lens)))
texts = [" ".join(words[offsets[i] : offsets[i + 1]]) for i in range(N)]

# planted near-dups: doc i clones doc i - N//50 with ~1/12 words swapped
n_dup = N // 50
dup_targets = rng.integers(0, N - n_dup, size=n_dup)
for j, src in enumerate(dup_targets):
    i = N - n_dup + j
    toks = texts[src].split(" ")
    for p in range(0, len(toks), 12):
        toks[p] = f"w{int(rng.integers(1, vocab_size + 1))}"
    texts[i] = " ".join(toks)

os.makedirs(DST, exist_ok=True)
table = pa.table(
    {
        "doc_id": pa.array(range(N), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * N, pa.string()),
        "source": pa.array(["zipf"] * N, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }
)
pq.write_table(table, f"{DST}/documents.parquet")
print(
    f"{DST}/documents.parquet: {N} docs, {total_words} words, "
    f"vocab {vocab_size}, {n_dup} planted near-dups",
    flush=True,
)
