"""PII redaction kernel: fixture-pinned (the synthetic documents corpus
contains no PII, so the library surface is tested on literal rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tile_processor_spark.functions import pii_counts, redact_pii

ROWS = [
    ("reach me at jane.doe+spam@example.co.uk today", "<EMAIL>", "email"),
    ("ssn 123-45-6789 on file", "<SSN>", "ssn"),
    ("call +1 (415) 555-0199 now", "<PHONE>", "phone"),
    ("origin 10.0.255.7 blocked", "<IP>", "ip"),
    ("no pii here at all", None, "clean"),
]


def test_redact_pii_replaces_each_category(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(ROWS)], "id long, text string"
    )
    out = {
        r["id"]: r["red"]
        for r in df.select("id", redact_pii(F.col("text")).alias("red")).collect()
    }
    for i, (text, token, _) in enumerate(ROWS):
        if token is None:
            assert out[i] == text, "clean text must pass through untouched"
        else:
            assert token in out[i], f"{token} missing in {out[i]!r}"
            assert out[i] != text


def test_email_not_split_by_phone_rule(spark):
    # The local part contains digit runs a greedy phone rule could eat if
    # ordering were wrong.
    df = spark.createDataFrame([(0, "id 123456789 mail 123456789@ex.org")], "id long, text string")
    red = df.select(redact_pii(F.col("text")).alias("r")).collect()[0]["r"]
    assert "<EMAIL>" in red
    assert "123456789@" not in red


def test_pii_counts_no_double_count(spark):
    df = spark.createDataFrame(
        [(0, "a@b.io and 999-88-7777 and 10.1.2.3 and a@b.io")], "id long, text string"
    )
    cols = pii_counts(F.col("text"))
    row = df.select(*[c.alias(n) for n, c in cols.items()]).collect()[0]
    assert row["n_email"] == 2
    assert row["n_ssn"] == 1
    assert row["n_ipv4"] == 1
    # The SSN's digits must not ALSO be counted as a phone number.
    assert row["n_phone"] == 0
