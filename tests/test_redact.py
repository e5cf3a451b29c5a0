"""PII redaction: masking behavior on synthetic fixtures (the shared
testdata corpus has no PII by construction)."""

from __future__ import annotations

import pytest

from weather_data_pipeline_sv_spark.functions.redact import redact_documents

DOCS = [
    (0, "contact john.doe+spam@example.co.uk for details"),
    (1, "server at 192.168.1.254 timed out, retry 10.0.0.7"),
    (2, "call +49 30 1234 5678 or (030) 555-0199 today"),
    (3, "mixed: a@b.io then 8.8.8.8 then +1 650-253-0000 done"),
    (4, "clean text with numbers 12345 and the year 2025 intact"),
    (5, "not-an-email a@@b..c and version 1.2.3.4.5 stays partial"),
    # round-2 ADVICE regressions: dates and formatted numbers are NOT phones
    (6, "released 2025-10-01, updated 12.03.2024, due 1-2-25 ok"),
    (7, "population 1 000 000 and price 1.000.000 versus 12-34 range"),
    (8, "dial 555-123-4567 or 040 123 4567 now"),
    # round-3 review regression: a '(' or '+' prefix must not let a date
    # or thousands grouping slip past the digit-anchored guards
    (9, "released (2025-10-01) by ops, cost (1 000 000), on +12.03.2024"),
    # the thousands guard must NOT admit '+': +CC XXX XXX XXX is a
    # standard international mobile format, not an amount
    (10, "call +46 708 123 456 today"),
]


@pytest.fixture(scope="module")
def redacted(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r for r in redact_documents(df).collect()}


def test_email_masked(redacted):
    r = redacted[0]
    assert r["text"] == "contact <EMAIL> for details"
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (1, 0, 0)


def test_ips_masked(redacted):
    r = redacted[1]
    assert r["text"] == "server at <IP> timed out, retry <IP>"
    assert r["n_ips"] == 2


def test_phones_masked(redacted):
    r = redacted[2]
    assert r["text"] == "call <PHONE> or <PHONE> today"
    assert r["n_phones"] == 2


def test_mixed_order_email_ip_phone(redacted):
    r = redacted[3]
    assert r["text"] == "mixed: <EMAIL> then <IP> then <PHONE> done"
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (1, 1, 1)


def test_clean_text_untouched(redacted):
    r = redacted[4]
    assert r["text"] == DOCS[4][1]
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (0, 0, 0)


def test_precision_over_recall(redacted):
    # malformed email stays; 5-octet dotted string only masks a 4-octet
    # prefix (conservative patterns, by design)
    r = redacted[5]
    assert "<EMAIL>" not in r["text"]


def test_dates_not_masked_as_phones(redacted):
    # ISO, dotted-euro, and short dashed dates all survive (round-2 ADVICE)
    r = redacted[6]
    assert r["text"] == DOCS[6][1]
    assert r["n_phones"] == 0


def test_formatted_numbers_not_masked_as_phones(redacted):
    # thousands groupings (space or dot) and short digit pairs survive
    r = redacted[7]
    assert r["text"] == DOCS[7][1]
    assert r["n_phones"] == 0


def test_prefixed_dates_not_masked_as_phones(redacted):
    # '(2025-10-01' previously matched from the '(' on: the guards were
    # anchored at a digit while the body admitted [+(] (round-3 review)
    r = redacted[9]
    assert r["text"] == DOCS[9][1]
    assert r["n_phones"] == 0


def test_plus_prefixed_international_phone_masked(redacted):
    r = redacted[10]
    assert r["text"] == "call <PHONE> today"
    assert r["n_phones"] == 1


def test_real_phones_still_masked_after_guards(redacted):
    # the guards must not cost recall on ordinary phone formats — including
    # '040 123 4567', whose PREFIX looks like a thousands grouping (the
    # excluded shapes only apply when they span the whole digit run)
    r = redacted[8]
    assert r["text"] == "dial <PHONE> or <PHONE> now"
    assert r["n_phones"] == 2
