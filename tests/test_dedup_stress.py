"""Adversarial-scale dedup stress: a dup-heavy corpus (>50% duplicates)
with a boilerplate FLOOD — thousands of identical docs that land in one
LSH band bucket — must go through _capped_bucket_pairs' over-cap star
path with O(b) candidates (bounded task memory, never O(b²) expansion)
while preserving cluster connectivity; and benchmark decontamination must
stay exact at >=10^6 distinct benchmark shingles (the broadcast-gate
regime boundary)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etlpy_spark.operators import dedup as dd

N_UNIQUE = 1_500   # base docs, each with one exact duplicate
N_FLOOD = 2_000    # identical boilerplate docs -> one mega-bucket per band
CAP = 256          # force the over-cap star path (default cap is 4096)


def _rand_text(rng, n_words: int) -> str:
    return " ".join(f"w{int(x)}" for x in rng.integers(0, 50_000, n_words))


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(N_UNIQUE):
        t = _rand_text(rng, 30)
        rows.append((i, t))
        rows.append((i + N_UNIQUE, t))  # exact duplicate
    boiler = "subscribe to our newsletter " + _rand_text(rng, 20)
    for j in range(N_FLOOD):
        rows.append((10_000 + j, boiler))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_mega_bucket_star_path_bounded_and_connected(spark, corpus):
    pairs = dd.minhash_lsh_pairs(corpus, max_bucket=CAP).cache()
    flood_ids = set(range(10_000, 10_000 + N_FLOOD))
    flood_pairs = [
        (r.id_a, r.id_b)
        for r in pairs.collect()
        if r.id_a in flood_ids and r.id_b in flood_ids
    ]
    # bounded: the 2,000-doc flood bucket exceeds the cap in EVERY band,
    # so it emits hub-star candidates — O(b) rows after pair-dedup, never
    # the ~2M all-pairs expansion (the bound is the task-memory assertion:
    # no collect_list array ever holds an over-cap bucket)
    assert N_FLOOD - 1 <= len(flood_pairs) <= 3 * N_FLOOD
    # connectivity: the star keeps the flood ONE component
    comp = dd.connected_components(
        spark.createDataFrame(flood_pairs, "id_a long, id_b long")
    )
    got = {r.id: r.cluster_id for r in comp.collect()}
    assert set(got) == flood_ids
    assert set(got.values()) == {min(flood_ids)}
    pairs.unpersist()


def test_dup_heavy_corpus_dedups_to_uniques(spark, corpus):
    # >50% duplicates end-to-end: 1,500 unique + 1,500 copies + 2,000
    # boilerplate -> 1,500 + 1 survivors
    out = dd.dedup_documents(corpus, strategy="minhash", max_bucket=CAP)
    assert out.count() == N_UNIQUE + 1
    # exact-dup pairs keep the min id; the flood keeps its hub
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert min(ids) == 0 and 10_000 in ids
    assert all(i < N_UNIQUE or i == 10_000 for i in ids)


def test_decontaminate_exact_at_1e6_shingles(spark):
    rng = np.random.default_rng(11)
    n_gram = 8
    bench_texts = [_rand_text(rng, 900) for _ in range(1_200)]
    bench = spark.createDataFrame(
        [(i, t) for i, t in enumerate(bench_texts)], "doc_id long, text string"
    )
    # the gate regime: >= 10^6 DISTINCT benchmark shingles
    n_shingles = (
        dd._shingle_hash_rows(bench, "text", n_gram, carry=[]).distinct().count()
    )
    assert n_shingles >= 1_000_000

    docs = []
    for i in range(1_000):  # clean
        docs.append((i, _rand_text(rng, 40)))
    for i in range(1_000):  # contaminated: one verbatim benchmark 8-gram
        src = bench_texts[int(rng.integers(0, len(bench_texts)))].split()
        k = int(rng.integers(0, len(src) - n_gram))
        span = " ".join(src[k : k + n_gram])
        docs.append((1_000 + i, _rand_text(rng, 16) + " " + span + " " + _rand_text(rng, 16)))
    corpus = spark.createDataFrame(docs, "doc_id long, text string")

    marked = dd.mark_contaminated(corpus, bench, n=n_gram)
    flags = {r.doc_id: r.contaminated_ngrams for r in marked.collect()}
    assert all(flags[i] >= 1 for i in range(1_000, 2_000))
    clean_ids = {r.doc_id for r in dd.decontaminate(corpus, bench, n=n_gram).select("doc_id").collect()}
    assert clean_ids == {i for i in range(1_000) if flags[i] == 0}
    # random 40-word docs essentially never share an 8-gram with the
    # benchmark, so the clean half survives (allow a freak collision)
    assert len(clean_ids) >= 999
