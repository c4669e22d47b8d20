"""Declared-schema projection (SURVEY.md §2.2 P4/P5 + §2.3 T6/T7).

The reference's load step copies only the DataTable-declared columns
(silently dropping extras), turns missing/empty properties into NULL, and
casts the typed columns (`Invoke-GraphDataPipelineToAzureSQLDatabase.ps1:
255-307`).  ``conform`` is the declarative equivalent: a single ``select``
of casts — Catalyst prunes every unreferenced source column all the way
into the scan (ReadSchema), so "drop the extras" costs nothing at any
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def conform(df: DataFrame, target: T.StructType, strict: bool = False) -> DataFrame:
    """Project ``df`` onto the declared ``target`` schema.

    - column present  → cast to the declared type (T6)
    - column missing  → NULL literal of the declared type (T7: the
      reference's DBNull substitution, `Invoke…ps1:295-303`)
    - extra columns   → dropped (P5: only declared columns are copied,
      `Invoke…ps1:288-307`)

    ``strict=True`` raises on missing columns instead (the NOT NULL id
    analog of `Prepare-SQLDatabase.sql:9`).
    """
    have = {c.lower(): c for c in df.columns}
    cols = []
    for f in target.fields:
        src = have.get(f.name.lower())
        if src is None:
            if strict:
                raise ValueError(f"conform: missing required column {f.name!r}")
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.col(src).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def exclude(df: DataFrame, *columns: str) -> DataFrame:
    """P4 — client-side column exclusion (`Select-Object -ExcludeProperty`,
    `Invoke…ps1:233-238`)."""
    return df.drop(*columns)


def pseudonymize_keys(df: DataFrame, cols: list[str], salt: str) -> DataFrame:
    """Consistent key pseudonymization: replace identifier columns with
    ``md5(salt || value)`` tokens — the GDPR-style companion of the PII
    content scrub (operators.text.pii_scrub handles free text; this
    handles the KEYS the reference ships to the warehouse — device ids,
    user principal names — `Invoke-GraphDataPipelineToAzureSQLDatabase.
    ps1:288-307` copies them verbatim).

    Properties that make it a data-engineering operator rather than a
    `withColumn` one-liner:

    - CONSISTENT: the same (salt, value) maps to the same token in every
      table and every run — joins, group-bys, and count-distincts keep
      working on the pseudonymized warehouse (pytest-pinned);
    - keyed: without the salt the token is not invertible by rainbow
      tables over small id domains; rotating the salt re-keys the whole
      warehouse (re-run = re-keyed, no state);
    - NULL-preserving: NULL ids stay NULL (not a shared token that would
      fuse all anonymous rows into one join partner);
    - a pure narrow map — zero shuffles at any scale.
    """
    out = df
    for c in cols:
        tok = F.md5(F.concat(F.lit(salt), F.col(c).cast("string")))
        out = out.withColumn(c, F.when(F.col(c).isNull(), None).otherwise(tok))
    return out
