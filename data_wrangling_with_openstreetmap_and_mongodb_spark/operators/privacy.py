"""PII detection and redaction for training-data pipelines.

Pretraining corpora are scrubbed of personally-identifiable strings before
anything else touches them; the standard first-line defense is pattern-based:
emails, phone numbers, IP addresses, and long numeric identifiers (account /
ID numbers) are detected and replaced by typed placeholder tokens.

Everything here is native ``regexp_count`` / ``regexp_replace`` Column
expressions — JVM-side, codegen'd, one linear scan per document, no Python in
the row path — so redaction runs at full scan speed on a 100 TB corpus (it
composes with any source: redact at ingest, before the text ever lands in a
shuffle).  Each pattern ships with a DuckDB SQL twin built from the same
regex string, so redaction output and per-pattern counts are oracle-checkable
value-for-value (the patterns avoid every construct where Java regex and RE2
diverge: no backreferences, no lookaround).

Pattern notes:

- ``email`` — the conventional liberal localpart@domain.tld shape.
- ``ipv4`` — four dot-separated 1-3 digit octets, word-bounded (no octet
  range check: redaction favors recall).
- ``phone`` — international-ish shape: optional ``+``, a 1-4 digit group,
  then 2-3 separator-delimited 3-4 digit groups.  Requires separators, so a
  bare digit run is NOT a phone (that's ``id_number``'s job) — keeps the two
  patterns disjoint and the redaction order irrelevant for counts.
- ``id_number`` — 6+ consecutive digits: account numbers, SSN-like runs,
  order ids.  Applied LAST so structured matches (emails, IPs, phones) keep
  their typed placeholder.

Redaction applies patterns in ``PII_PATTERNS`` order (most-structured first);
counts are computed per-pattern on the ORIGINAL text, so they are independent
signals (an email's digits do not double-count as an id unless they form a
6+ run on their own).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# name -> (regex, placeholder); ORDER IS THE REDACTION ORDER.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "phone": (r"\+?\d{1,4}([-. ]\d{3,4}){2,3}", "<PHONE>"),
    "id_number": (r"\d{6,}", "<ID>"),
}


def redact_pii(col: Column) -> Column:
    """Text with every PII pattern replaced by its typed placeholder.

    Sequential ``regexp_replace`` chain in ``PII_PATTERNS`` order — still one
    codegen'd projection (Catalyst fuses the chain), still one scan.
    """
    out = col
    for pattern, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-pattern match counts on the original text (independent signals).

    Keys are pattern names; use as
    ``df.select(*[c.alias(f"n_{k}") for k, c in pii_counts(col).items()])``.
    """
    return {
        name: F.regexp_count(col, F.lit(pattern))
        for name, (pattern, _) in PII_PATTERNS.items()
    }


def pii_profile(df: DataFrame, text_col: str, *group_cols: str) -> DataFrame:
    """Aggregate PII audit per group: document counts, per-pattern totals,
    and how many characters redaction removes (all integer-exact).

    One scan, one hash-aggregate — the shape of a corpus-wide privacy audit
    at 100 TB (group by source/crawl/shard).
    """
    c = F.col(text_col)
    counts = pii_counts(c)
    return (
        df.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.sum(cnt).alias(f"n_{name}") for name, cnt in counts.items()],
            F.sum(F.length(c) - F.length(redact_pii(c))).alias("chars_removed"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB SQL twins (same regex strings, RE2-compatible subset)
# ---------------------------------------------------------------------------
def redact_pii_sql(expr: str) -> str:
    """DuckDB fragment matching :func:`redact_pii` output exactly."""
    out = expr
    for pattern, token in PII_PATTERNS.values():
        out = f"regexp_replace({out}, '{pattern}', '{token}', 'g')"
    return out


def pii_count_sql(expr: str, name: str) -> str:
    """DuckDB fragment matching ``pii_counts(col)[name]`` exactly."""
    pattern, _ = PII_PATTERNS[name]
    return f"len(regexp_extract_all({expr}, '{pattern}'))"
