"""Text-cleaning operator tests: planted PII must be redacted and
counted; normalization must be canonical and idempotent."""

from pyspark.sql import functions as F

from dbt_project_spark.operators.text_clean import normalize_text, redact_pii


def test_redact_pii_planted(spark):
    rows = [
        (1, "contact me at jane.doe+x@example.co.uk or on +1 (555) 123-4567"),
        (2, "server 192.168.0.1 serves https://example.com/a?b=c#d fine"),
        (3, "nothing sensitive here at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}

    r1 = got[1]
    assert r1["n_email"] == 1 and r1["n_phone"] == 1
    assert "jane.doe" not in r1["redacted"] and "555" not in r1["redacted"]
    assert r1["redacted"].count("[REDACTED]") == 2

    r2 = got[2]
    assert r2["n_ipv4"] == 1 and r2["n_url"] == 1
    assert "192.168" not in r2["redacted"]
    assert "example.com" not in r2["redacted"]
    # surrounding prose survives
    assert r2["redacted"].startswith("server ") and r2["redacted"].endswith(" fine")

    r3 = got[3]
    assert (r3["n_email"], r3["n_phone"], r3["n_ipv4"], r3["n_url"]) == (0, 0, 0, 0)
    assert r3["redacted"] == rows[2][1]


def test_normalize_text_canonical_and_idempotent(spark):
    df = spark.createDataFrame(
        [(1, "  Hello,   WORLD!! (x=1) "), (2, "hello world x 1")],
        ["doc_id", "text"],
    )
    out = df.select(
        "doc_id", normalize_text("text").alias("n")
    ).collect()
    vals = {r["doc_id"]: r["n"] for r in out}
    assert vals[1] == "hello world x 1"
    assert vals[1] == vals[2]  # canonical: both forms collapse to one
    # idempotent: normalizing the normalized form is a no-op
    again = df.select(normalize_text(normalize_text("text")).alias("n")).collect()
    assert [r["n"] for r in again] == [vals[1], vals[2]]


def test_redact_counts_match_redactions(spark):
    """n_* columns count what THIS pass redacted: a span consumed by an
    earlier pattern (digits in a URL, an IP that also looks like a
    phone) must not be double-counted by a later one."""
    rows = [
        (1, "see https://ex.com/p?id=5551234567 for details"),
        (2, "host 10.20.30.40 answered"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}

    r1 = got[1]  # digit run lives inside the URL: counted once, as URL
    assert r1["n_url"] == 1
    assert r1["n_phone"] == 0
    assert r1["redacted"].count("[REDACTED]") == 1

    r2 = got[2]  # dotted quad is ipv4, not a phone number
    assert r2["n_ipv4"] == 1
    assert r2["n_phone"] == 0
    assert r2["redacted"].count("[REDACTED]") == 1
