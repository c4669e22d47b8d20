"""Python UDTFs — table-valued functions for variable-fanout row logic.

The engine's custom-operator ladder (SURVEY.md §2.5: DataFrame composition
→ Pandas UDF → mapInPandas) gains its Spark-4 rung here: a Python UDTF is
a table function usable from SQL ``LATERAL`` joins and
``DataFrame.lateralJoin`` — per-input-row Python that emits zero..N output
rows with a declared schema, the right tool when the fanout logic is
genuinely imperative (stateful scanners, third-party parsers) and a
``posexplode`` of a Column expression can't express it.

Everything expressible as Column ops should STAY Column ops (the engine's
chunking/splitting paths are posexplode-based and plan into codegen);
``split_sentences`` here intentionally duplicates a Column-expressible
computation so the pytest can pin UDTF output == the declarative twin —
the evidence the rung works, not a recommendation to use Python where
codegen serves.  ``useArrow=True`` batches rows over Arrow, the same
boundary contract as the engine's Pandas UDFs (per-row pickle is the
slow path this repo never ships).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sent_id int, sentence string, n_tokens int", useArrow=True)
class SplitSentences:
    """Split ``text`` into sentences on ``.!?`` boundaries; emit one row
    per non-empty sentence with its 1-based index and whitespace token
    count.  Deterministic, stateless per row — safe under task retry."""

    def eval(self, text: str):  # noqa: D102 — schema documented above
        if text is None:
            return
        import re

        parts = re.split(r"(?<=[.!?])\s+", text.strip())
        i = 0
        for p in parts:
            p = p.strip()
            if not p:
                continue
            i += 1
            yield i, p, len(p.split())


def register_table_functions(spark) -> None:
    """Register the UDTFs for SQL use (``LATERAL split_sentences(text)``)."""
    spark.udtf.register("split_sentences", SplitSentences)
