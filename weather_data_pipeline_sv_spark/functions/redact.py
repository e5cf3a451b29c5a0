"""PII redaction for text corpora — the scrubbing pass every pretraining
pipeline runs before training (emails / phone numbers / IP addresses →
typed placeholder tokens).

All masking is JVM-side ``regexp_replace`` / ``regexp_count`` (no Python
UDFs), so the scrub runs inside whole-stage codegen as a narrow map over
the corpus scan — zero shuffles, trivially 100 TB-scalable. Patterns are
deliberately conservative (high precision): corpus scrubbing prefers
leaving a rare exotic format unmasked over destroying ordinary text.

The testdata corpus contains no PII by construction, so this module is
pytest-verified on synthetic fixtures rather than oracle-checked on the
shared tables (`tests/test_redact.py`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
# international-ish phone: optional +country / leading area-code paren,
# then a digit run with separators, anchored on digit boundaries so plain
# numbers in prose aren't eaten. Precision guards (each asserts the
# excluded shape spans the ENTIRE digit run via _RUN_END, so a real phone
# with a thousands-like or date-like prefix is still masked):
#   - at least 7 digits reachable through separators (drops '12-34', years)
#   - ISO dates 2025-10-01 and dotted/euro dates 12.03.2024 / 1-2-25
#   - thousands groupings 1 000 000 / 1.000.000
# A candidate STARTING with a full date shape is left unmasked even if more
# digits trail after a gap — corpus scrubbing prefers precision (see module
# docstring); the date-adjacent-phone corner case is documented in
# tests/test_redact.py.
_RUN_END = r"(?![0-9]|[ ()\-.]{1,3}[0-9])"  # digit run genuinely ends here
# The date guards admit the same optional [+(] prefix as the match body —
# otherwise '(2025-10-01' would slip past the digit-anchored date guards
# and be eaten from the '(' on. The thousands guard admits only '('
# (amounts are parenthesized for negatives; they are never written with
# a leading '+', while '+CC XXX XXX XXX' is a standard international
# mobile format that must STAY masked).
PHONE_RE = (
    r"(?<![0-9A-Za-z])"
    rf"(?![+(]?[0-9]{{4}}[-./][0-9]{{1,2}}[-./][0-9]{{1,2}}{_RUN_END})"
    rf"(?![+(]?[0-9]{{1,2}}[-./][0-9]{{1,2}}[-./][0-9]{{2,4}}{_RUN_END})"
    rf"(?![(]?[0-9]{{1,3}}(?:[ .][0-9]{{3}})+{_RUN_END})"
    r"(?=(?:[ ()\-.+]*[0-9]){7})"
    r"[+(]?[0-9][0-9 ()\-.]{6,14}[0-9](?![0-9A-Za-z])"
)

EMAIL_TOKEN, IP_TOKEN, PHONE_TOKEN = "<EMAIL>", "<IP>", "<PHONE>"


def mask_emails(c: Column) -> Column:
    return F.regexp_replace(c, EMAIL_RE, EMAIL_TOKEN)


def mask_ipv4(c: Column) -> Column:
    return F.regexp_replace(c, IPV4_RE, IP_TOKEN)


def mask_phones(c: Column) -> Column:
    return F.regexp_replace(c, PHONE_RE, PHONE_TOKEN)


def mask_pii(c: Column) -> Column:
    """Email → IP → phone, in that order: the earlier (more specific)
    patterns consume their digits before the greedy phone pattern sees
    them (an IP would otherwise partially match as a phone)."""
    return mask_phones(mask_ipv4(mask_emails(c)))


def redact_documents(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Scrub + per-doc accounting: the redacted text plus how many of each
    PII type were found (the audit columns QA dashboards aggregate)."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_emails": F.regexp_count(c, F.lit(EMAIL_RE)).cast("int"),
            "n_ips": F.regexp_count(c, F.lit(IPV4_RE)).cast("int"),
            "n_phones": F.regexp_count(
                mask_ipv4(mask_emails(c)), F.lit(PHONE_RE)
            ).cast("int"),
            text_col: mask_pii(c),
        }
    )
