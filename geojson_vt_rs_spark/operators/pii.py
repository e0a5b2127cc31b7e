"""PII scrubbing: redact emails / IPv4 addresses / SSN-shaped ids from
document text and count what was removed — the mandatory privacy pass of
a training-data pipeline.

Pure JVM ``regexp_replace`` / ``regexp_extract_all`` column expressions
(row-local, no shuffle, scales linearly with the scan), with DuckDB SQL
twins.  Patterns use ONLY constructs whose semantics are identical in
Java regex and RE2 — explicit character classes, bounded repetition, no
``\\d``/``\\b``/lookaround/backrefs — so the redacted text and counts are
byte-identical across engines (the value-hash oracle checks the actual
redacted strings, not just counts).

Redaction order is fixed (email, then ipv4, then id) and each pattern
runs over the OUTPUT of the previous one, identically on both engines.

No reference counterpart (maxammann/geojson-vt-rs is a vector-tile
engine); sits beside text_dedup/sampling/decontam as the graft's
training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — order matters: each applies to the
# previous step's output.  Patterns are Java==RE2-identical subsets.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
        "<IP>",
    ),
    (
        "id_num",
        r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
        "<ID>",
    ),
]


def with_pii_redacted(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Adds ``n_<name>`` match counts and a ``redacted`` text column.

    Counts are taken on the pre-redaction text of each step (the same
    text the replace sees), so count==number of substitutions made.
    """
    out = docs
    cur: Column = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        # idx=0 = whole match (Spark's default idx is 1 = first group,
        # which errors on group-free patterns; DuckDB defaults to 0)
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).cast("long"),
        )
        cur = F.regexp_replace(cur, pat, repl)
    # NULL text propagates: counts are null (size(null)) -> coalesce to
    # match DuckDB's len(regexp_extract_all(NULL)) = NULL semantics by
    # KEEPING the null (both engines agree).
    for name, _, _ in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(
                F.col(f"n_{name}")
            ),
        )
    return out.withColumn("redacted", cur)


def duck_pii_exprs(text_expr: str = "text") -> dict:
    """DuckDB twins: ``n_<name>`` count expressions and the chained
    ``redacted`` expression (same fixed order)."""
    out: dict = {}
    cur = text_expr
    for name, pat, repl in PII_PATTERNS:
        # DuckDB single-quoted strings do not process backslashes —
        # the pattern goes in verbatim
        out[f"n_{name}"] = f"len(regexp_extract_all({cur}, '{pat}'))"
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    out["redacted"] = cur
    return out
