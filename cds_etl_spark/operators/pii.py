"""PII detection and redaction over text columns.

Generalizes the reference's SSN scan — a per-cell regex search that
only REPORTS hits (cds_transformation_functions.py:284-299, surfaced
in `5-ID-Validation-Result/`) — into the detect + redact pass a
pretraining corpus needs before release.

Design:

* Patterns are a named, ordered dict of regexes drawn from the common
  RE2/Java subset (no lookaround, no backreferences) so the SAME
  pattern strings run in Spark (Java regex), DuckDB (RE2), and any
  other engine auditing the corpus — the cross-engine property the
  oracle check depends on.
* Both operators are pure row-local `regexp_*` projections: no
  shuffle, no Python, fused into the scan. At 100 TB the cost is the
  scan plus the regex automaton per row — the cheapest possible shape.
* Redaction replaces in a FIXED pattern order (dict order), each with
  its own tag. Order matters where patterns could overlap (an email
  contains digit runs); the dict lists the most-specific first so the
  generic patterns see already-redacted text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Most-specific first; every value is valid Java regex AND RE2.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts (long), one `regexp_extract_all` per
    pattern. Counts are taken on the ORIGINAL text, so categories are
    independent of redaction order."""
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).cast("long")
        for name, pat in PII_PATTERNS.items()
    }


def pii_redact(text: Column) -> Column:
    """Replace every PII match with `[<CATEGORY>]`, applying patterns
    in `PII_PATTERNS` order (most-specific first)."""
    out = text
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{name.upper()}]")
    return out
