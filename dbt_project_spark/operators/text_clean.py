"""Text cleaning operators for corpus pipelines: normalization and
PII redaction.

All codegen regex/string expressions (JVM-side, no UDFs). The PII
patterns are the standard training-data-pipeline set (emails, phone
numbers, IPv4, URLs) — conservative, precision-oriented forms; a
production pipeline layers NER on top for names/addresses, which is
model-driven and out of scope for an engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order matters: URLs before emails (a URL can contain '@' userinfo),
# emails and IPv4s before phones (digits inside an email, and dotted
# quads, would otherwise match the loose phone pattern).
PII_PATTERNS: dict[str, str] = {
    "url": r"https?://[^\s]+",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+?\d[\d\s().-]{7,}\d",
}


def normalize_text(col: Column | str) -> Column:
    """Lowercase, strip non-alphanumerics to spaces, collapse runs of
    whitespace, trim — the canonical form for exact/fuzzy dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), "[^a-z0-9 ]", " "), " +", " "
        )
    )


def redact_pii(
    df: DataFrame, text_col: str = "text", token: str = "[REDACTED]"
) -> DataFrame:
    """Replace PII spans with ``token``; adds one count column per
    pattern plus the redacted text. One projection, no shuffle —
    embarrassingly parallel over the corpus.

    Each ``n_{pattern}`` counts matches against the PROGRESSIVELY
    redacted string (the input after all earlier patterns were
    replaced), so the counts agree with what this pass actually
    redacted: a phone-like digit run inside a URL is counted (and
    redacted) as part of the URL, not again as a phone.
    """
    out = df
    red = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(red, F.lit(pat), F.lit(0))),
        )
        red = F.regexp_replace(red, pat, token)
    return out.withColumn("redacted", red)
