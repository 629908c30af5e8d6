"""PII scrubbing: mask emails / phone numbers / IPv4 addresses in text.

A standard pre-training hygiene pass (the C4/MassiveText pipelines apply
equivalent regex masks).  Patterns are deliberately conservative,
engine-portable regexes (no lookaround, no backreferences) so the SAME
pattern text runs on Spark's Java regex and the oracle's RE2 — the parity
row compares the scrubbed strings byte-for-byte.

Masks apply in a fixed order (email, then phone, then IPv4) because the
classes can overlap textually; both engines must replay the same order.
All work is regexp_replace / regexp_count column expressions — JVM-side,
codegen'd, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, mask) — applied in this order
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("phone", r"\d{3}[-. ]\d{3}[-. ]\d{4}", "<PHONE>"),
    ("ipv4", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
)


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "scrubbed"
) -> DataFrame:
    """Adds ``out_col`` (masked text) and one ``n_<name>`` count column per
    pattern.  Counts are taken BEFORE masking, on the original text for the
    first pattern and on the successively-masked text for later ones, so a
    string consumed by an earlier mask is not double-counted."""
    out = df
    masked: Column = F.col(text_col)
    for name, pat, mask in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", F.regexp_count(masked, F.lit(pat)))
        masked = F.regexp_replace(masked, pat, mask)
    return out.withColumn(out_col, masked)
