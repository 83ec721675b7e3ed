"""Tests for the from-scratch byte-level BPE (functions/bpe.py): trainer
determinism + hand-checkable merges, greedy-merge counting differential
(vectorized/memoized UDF vs the serial reference), merges.txt round-trip,
and the pack_sequences budget wiring."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etlpy_spark.functions.bpe import (
    _apply_bpe,
    bpe_token_count,
    bpe_token_count_serial,
    merges_from_text,
    merges_to_text,
    pretokenize,
    train_bpe,
)


def test_pretokenize_gpt2_style():
    toks = pretokenize("Hello world, it's 42!")
    assert toks == [b"Hello", b" world", b",", b" it", b"'s", b" 42", b"!"]


def test_trainer_hand_example():
    # "low low low lower lowest": 'lo' then 'low'-ish merges dominate
    corpus = ["low low low", "lower lowest low"]
    merges = train_bpe(corpus, 3)
    assert merges[0] == (b"l", b"o")  # most frequent pair
    assert (b"lo", b"w") in merges
    # determinism: same corpus -> identical merges
    assert merges == train_bpe(corpus, 3)


def test_apply_bpe_counts():
    merges = [(b"l", b"o"), (b"lo", b"w"), (b"e", b"r")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert _apply_bpe(b"low", ranks) == 1  # l+o -> lo, lo+w -> low
    assert _apply_bpe(b"lower", ranks) == 2  # low + er
    assert _apply_bpe(b"xyz", ranks) == 3  # nothing merges


def test_serial_count_and_text_roundtrip():
    corpus = ["the cat sat on the mat", "the mat sat on the cat"]
    merges = train_bpe(corpus, 20)
    text = merges_to_text(merges)
    assert merges_from_text(text) == merges
    n = bpe_token_count_serial("the cat sat", merges)
    assert 1 <= n <= len("the cat sat")


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=383),
               max_size=80), st.integers(0, 40))
def test_greedy_merge_invariants(text, n_merges):
    corpus = [text, "shared training words here", text + " suffix"]
    merges = train_bpe(corpus, n_merges)
    n = bpe_token_count_serial(text, merges)
    n_unmerged = sum(len(w) for w in pretokenize(text))
    assert 0 <= n <= n_unmerged
    if n_merges == 0:
        assert n == n_unmerged


def test_udf_differential_vs_serial(spark):
    rng = np.random.RandomState(5)
    words = ["alpha", "beta", "gamma", "delta", "lowest", "low", "12,34",
             "it's", "  spaced", "punct!?."]
    texts = [
        " ".join(rng.choice(words, size=rng.randint(1, 30)))
        for _ in range(60)
    ] + ["", "   ", "ünïcødé tëxt façade"]
    merges = train_bpe(texts, 64)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i int, text string")
    got = {
        r["i"]: r["n"]
        for r in df.select("i", bpe_token_count("text", merges).alias("n")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == bpe_token_count_serial(t, merges), (i, t)


def test_pack_sequences_with_bpe_budget(spark):
    from etlpy_spark.operators.sampling import pack_sequences

    texts = [("d%03d" % i, "word " * (i % 17 + 1)) for i in range(40)]
    merges = train_bpe([t for _, t in texts], 16)
    df = spark.createDataFrame(texts, "doc_id string, text string")
    df = df.withColumn("n_bpe", bpe_token_count("text", merges))
    packed = pack_sequences(df, token_col="n_bpe", id_col="doc_id", budget=40)
    rows = packed.collect()
    assert len(rows) == 40
    fills = {}
    for r in rows:
        fills.setdefault(r["bin_id"], 0)
        fills[r["bin_id"]] += r["n_bpe"]
    for b, f in fills.items():
        # singleton bins may exceed the budget (oversized docs); multi-doc
        # bins never do
        members = [r for r in rows if r["bin_id"] == b]
        if len(members) > 1:
            assert f <= 40, (b, f)


def test_annotate_corpus_bpe_column(spark):
    from etlpy_spark.operators.corpus import annotate_corpus

    texts = [("a", "the quick brown fox jumps over the lazy dog " * 3),
             ("b", "lorem ipsum dolor sit amet " * 4)]
    merges = train_bpe([t for _, t in texts], 32)
    df = spark.createDataFrame(texts, "doc_id string, text string")
    out = annotate_corpus(df, bpe_merges=merges).select("doc_id", "n_tokens")
    got = {r["doc_id"]: r["n_tokens"] for r in out.collect()}
    for k, t in texts:
        assert got[k] == bpe_token_count_serial(t, merges)
