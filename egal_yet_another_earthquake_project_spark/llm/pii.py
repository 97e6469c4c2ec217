"""PII detection/redaction over text columns — the scrubbing pass a
training-data pipeline runs before anything leaves the curation zone.

Entirely JVM-side (`regexp_extract_all` / `regexp_replace` — no Python
in the hot path), so the scan parallelizes like any other projection:
no shuffle, no UDF serialization, pushdown-friendly. Patterns stay in
the RE2 ∩ java.util.regex common subset (character classes, bounded
repetition, alternation; no lookaround, no backreferences) so the same
strings drive both Spark and the DuckDB oracle.

Counting and redaction are separate surfaces on purpose: counts are
per-pattern over the ORIGINAL text (overlaps allowed — an email also
contains a digit run), while redaction applies sequentially in
``PII_ORDER`` so earlier, more-specific patterns win the overlap
(an email is replaced before its digits can match ``digit_run``).

No counterpart in the reference (it processes structured sensor feeds,
not raw text; cf. `/root/reference/sparktoELKstream.py` which maps typed
columns only) — this is part of the LLM-pipeline layer the brief adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Pattern name → (regex, replacement token). Order matters for redaction.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "url": (r"https?://[^\s]+", "<URL>"),
    "ipv4": (
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
    "digit_run": (r"[0-9]{7,}", "<NUM>"),
}

PII_ORDER: tuple[str, ...] = ("email", "url", "ipv4", "digit_run")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_count(text: Column | str, kind: str) -> Column:
    """Number of matches of one PII pattern in the original text."""
    pattern, _ = PII_PATTERNS[kind]
    return F.size(F.regexp_extract_all(_c(text), F.lit(pattern), 0))


def redact(text: Column | str) -> Column:
    """Text with every PII pattern replaced by its token, applied in
    ``PII_ORDER`` (specific → generic)."""
    out = _c(text)
    for kind in PII_ORDER:
        pattern, token = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII profile: one count column per pattern, the total,
    and the redacted text's md5 + length (the hash lets an oracle verify
    the full redacted string without shipping it around).

    Single narrow projection — the whole profile is one codegen stage
    over the scan, so at 100 TB it runs at scan speed with zero shuffle.
    """
    counts = {kind: pii_count(text_col, kind) for kind in PII_ORDER}
    red = redact(text_col)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{kind}") for kind, c in counts.items()],
        total.alias("n_pii"),
        F.length(red).alias("redacted_len"),
        F.md5(red).alias("redacted_md5"),
    )
