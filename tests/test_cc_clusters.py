"""Connected-components near-dup clustering vs a serial union-find
oracle, including composition with the MinHash pair miner (the full
pipeline a training-data dedup actually runs: mine pairs -> cluster ->
keep one survivor per cluster)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etlpy_spark.operators.dedup import (
    connected_components,
    dedup_by_pairs,
)


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min member per component
    comp = {}
    for x in list(parent):
        comp[x] = find(x)
    return comp


def test_cc_matches_union_find_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 120
        pairs = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(80 + 40 * trial)
            }
        )
        exp = _union_find(pairs)
        df = spark.createDataFrame(pairs, schema="id_a long, id_b long")
        got = {
            r.id: r.cluster_id
            for r in connected_components(df).collect()
        }
        assert got == exp


def test_cc_chain_requires_propagation(spark):
    """A long path graph forces multiple label-propagation rounds."""
    chain = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(chain, schema="id_a long, id_b long")
    got = {r.id: r.cluster_id for r in connected_components(df).collect()}
    assert got == {i: 0 for i in range(41)}


def test_dedup_by_pairs_keeps_one_survivor_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], schema="doc_id long, text string"
    )
    # clusters {0,1,2} (via chain) and {5,6}; 3,4,7,8,9 untouched
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], schema="id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id for r in dedup_by_pairs(docs, pairs).collect()
    )
    assert kept == [0, 3, 4, 5, 7, 8, 9]


def test_pipeline_minhash_to_survivors(spark):
    """End-to-end: near-identical doc family + distinct docs -> the
    pair miner links the family, clustering keeps exactly one."""
    from etlpy_spark.operators.dedup import minhash_lsh_pairs

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest while the sun sets slowly tonight"
    )
    rows = [(i, base + f" variant tail {i % 2}") for i in range(6)]
    rows += [
        (100 + i, f"completely unrelated document number {i} " * 6)
        for i in range(4)
    ]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    pairs = minhash_lsh_pairs(docs, threshold=0.7)
    out = dedup_by_pairs(docs, pairs)
    kept = sorted(r.doc_id for r in out.collect())
    # the 6 near-identical variants collapse; distinct docs survive
    assert set(kept) >= {100, 101, 102, 103}
    assert len([k for k in kept if k < 100]) < 6
    exp = _union_find([(r.id_a, r.id_b) for r in pairs.collect()])
    survivors = {v for v in exp.values()}
    assert set(kept) == survivors | ({i for i, _ in rows} - set(exp))
