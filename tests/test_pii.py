"""PII detection/redaction: hand fixtures + dialect parity with RE2."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from vector_db_api_spark.functions import pii as P


@pytest.fixture(scope="module")
def rows(spark):
    return spark.createDataFrame(
        [
            (1, "reach me at alice.smith+spam@corp.example.org today"),
            (2, "server 192.168.1.10 talked to 10.0.0.7"),
            (3, "call +14155551234 now"),
            (4, "clean text with no sensitive content"),
            (5, "bob@a.io from 127.0.0.1 dial +4930123456"),
        ],
        "doc_id bigint, text string",
    )


def test_pii_counts(rows):
    got = {
        r["doc_id"]: (r["e"], r["i"], r["p"])
        for r in rows.select(
            "doc_id",
            P.pii_counts("text")["email"].alias("e"),
            P.pii_counts("text")["ipv4"].alias("i"),
            P.pii_counts("text")["phone"].alias("p"),
        ).collect()
    }
    assert got == {1: (1, 0, 0), 2: (0, 2, 0), 3: (0, 0, 1), 4: (0, 0, 0), 5: (1, 1, 1)}


def test_redaction_masks_all_kinds(rows):
    got = {r["doc_id"]: r["c"] for r in rows.select(
        "doc_id", P.redact_pii("text").alias("c")).collect()}
    assert got[1] == "reach me at [EMAIL] today"
    assert got[2] == "server [IP] talked to [IP]"
    assert got[3] == "call [PHONE] now"
    assert got[4] == "clean text with no sensitive content"
    assert got[5] == "[EMAIL] from [IP] dial [PHONE]"


def test_has_pii_gate(rows):
    flagged = sorted(
        r["doc_id"] for r in rows.filter(P.has_pii("text")).collect()
    )
    assert flagged == [1, 2, 3, 5]


def test_patterns_agree_with_re2(rows):
    """Same pattern strings, Java regex vs RE2, same matches and masks."""
    pdf = rows.select(
        "doc_id", "text", P.redact_pii("text").alias("clean")
    ).toPandas()
    con = duckdb.connect()
    con.register("t", pdf[["doc_id", "text"]])
    red = "text"
    for kind in ("email", "ipv4", "phone"):
        red = (
            f"regexp_replace({red}, '{P.PII_PATTERNS[kind]}', "
            f"'{P.REDACTION_TOKENS[kind]}', 'g')"
        )
    want = dict(con.execute(f"SELECT doc_id, {red} FROM t").fetchall())
    got = dict(zip(pdf["doc_id"], pdf["clean"]))
    assert got == want
