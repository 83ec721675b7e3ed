"""Stratified hash-gate sampling + context-window packing operators."""

from __future__ import annotations

from etlpy_spark.operators.sampling import pack_sequences, stratified_sample


def _docs(spark, n=2000):
    rows = [(i, ["en", "de", "fr"][i % 3], 10 + (i * 37) % 900) for i in range(n)]
    return spark.createDataFrame(rows, schema="doc_id long, lang string, tokens int")


def test_stratified_sample_rates_and_determinism(spark):
    df = _docs(spark)
    frac = {"en": 0.5, "de": 0.1}
    s1 = stratified_sample(df, "lang", frac, id_col="doc_id", seed=3)
    s2 = stratified_sample(df, "lang", frac, id_col="doc_id", seed=3)
    ids1 = sorted(r.doc_id for r in s1.collect())
    # deterministic: identical sample on re-run (and on any partitioning)
    assert ids1 == sorted(r.doc_id for r in s2.repartition(7).collect())
    got = {r.lang: r.n for r in s1.groupBy("lang").agg({"*": "count"})
           .withColumnRenamed("count(1)", "n").collect()}
    # ~667 docs per stratum; hash gate binomial tolerance
    assert abs(got.get("en", 0) - 333) < 60
    assert abs(got.get("de", 0) - 67) < 35
    assert "fr" not in got  # default fraction 0
    # different seed -> different sample
    s3 = stratified_sample(df, "lang", frac, id_col="doc_id", seed=4)
    assert ids1 != sorted(r.doc_id for r in s3.collect())


def test_pack_sequences_budget_and_coverage(spark):
    df = _docs(spark, n=500)
    out = pack_sequences(df, token_col="tokens", id_col="doc_id", budget=2048)
    rows = out.collect()
    # every doc packed exactly once
    assert sorted(r.doc_id for r in rows) == list(range(500))
    fills = {}
    for r in rows:
        fills.setdefault(r.bin_id, 0)
        fills[r.bin_id] += r.tokens
    # no bin exceeds the budget; bin_fill matches the recomputed fill
    assert all(v <= 2048 for v in fills.values())
    for r in rows:
        assert r.bin_fill == fills[r.bin_id]
    # packing is reasonably tight: total slack under 40% of used capacity
    used = sum(fills.values())
    assert used / (len(fills) * 2048) > 0.6


def test_pack_sequences_oversize_doc_gets_singleton_bin(spark):
    rows = [(1, "en", 5000), (2, "en", 100), (3, "en", 120)]
    df = spark.createDataFrame(rows, schema="doc_id long, lang string, tokens int")
    out = {r.doc_id: (r.bin_id, r.bin_fill) for r in
           pack_sequences(df, "tokens", "doc_id", budget=1024).collect()}
    big_bin = out[1][0]
    assert out[1][1] == 5000
    assert out[2][0] != big_bin and out[3][0] != big_bin
