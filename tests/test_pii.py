"""PII detection/redaction differential test: the Spark Column
implementation (etlpy_spark/operators/text.py PII_PATTERNS, Java regex)
must agree byte-for-byte with a pure-Python `re` oracle on texts that mix
every PII class with near-miss decoys. The pattern subset is chosen to
behave identically under both engines; this test is the proof."""

import random
import re

from pyspark.sql import functions as F

from etlpy_spark.operators.text import PII_PATTERNS, pii_counts, redact_pii

WORDS = ["alpha", "beta", "contact", "at", "or", "call", "now", "ref"]
PII_SAMPLES = [
    "john.doe+spam@example.co.uk",
    "a_b%c@mail-server.org",
    "192.168.0.1",
    "10.0.255.254",
    "555-867-5309",
    "555 867 5309",
    "123-45-6789",
    "4111-1111-1111-1111",
    "4111 1111 1111 1111",
]
DECOYS = [
    "not@an@email",          # double @: trailing part still matches -> both engines
    "1234-5678",             # too short for cc/phone
    "12-34-5678",            # wrong grouping
    "999.999.999.9999",      # 4-digit last octet: prefix still matches -> both engines
    "4111-1111 1111-1111",   # mixed separators: backreference must reject
    "v1.2.3.4",              # dotted version string: no \\b before the 1 -> no match, same both sides
]


def _make_texts(n=200):
    rng = random.Random(42)
    texts = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randint(3, 10)):
            r = rng.random()
            if r < 0.35:
                parts.append(rng.choice(PII_SAMPLES))
            elif r < 0.55:
                parts.append(rng.choice(DECOYS))
            else:
                parts.append(rng.choice(WORDS))
        texts.append(" ".join(parts))
    return texts


def _py_redact(text):
    for _, pat, token in PII_PATTERNS:
        text = re.sub(pat, token, text)
    return text


def _py_counts(text):
    return {name: len(re.findall(pat, text)) for name, pat, _ in PII_PATTERNS}


def test_pii_redaction_matches_python_oracle(spark):
    texts = _make_texts()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    rows = (
        df.select("id", pii_counts("text").alias("c"), redact_pii("text").alias("r"))
        .orderBy("id")
        .collect()
    )
    assert len(rows) == len(texts)
    hit_any = {name: 0 for name, _, _ in PII_PATTERNS}
    for row, text in zip(rows, texts):
        expect_counts = _py_counts(text)
        got_counts = row["c"].asDict()
        assert got_counts == expect_counts, (text, got_counts, expect_counts)
        assert row["r"] == _py_redact(text), text
        for k, v in expect_counts.items():
            hit_any[k] += v
    # the corpus must actually exercise every class
    assert all(v > 0 for v in hit_any.values()), hit_any


def test_pii_redact_subset_kinds(spark):
    df = spark.createDataFrame(
        [(1, "mail bob@x.org ip 1.2.3.4 ssn 123-45-6789")], "id long, text string"
    )
    out = df.select(redact_pii("text", kinds=["email"]).alias("r")).collect()[0]["r"]
    assert out == "mail [EMAIL] ip 1.2.3.4 ssn 123-45-6789"
