"""Vectorized Bloom filter: no false negatives ever; FPR near spec."""

from __future__ import annotations

import numpy as np

from etlpy_spark.crawl.seen import BloomFilter


def test_no_false_negatives():
    bf = BloomFilter.sized_for(10_000, fpp=0.01)
    urls = [f"http://host{i % 50}.example/cat{i % 7}/p{i}" for i in range(10_000)]
    bf.add_many(urls)
    hits = bf.might_contain_many(urls)
    assert hits.all(), "bloom must never miss an added key"


def test_false_positive_rate_near_spec():
    bf = BloomFilter.sized_for(10_000, fpp=0.01)
    bf.add_many([f"u{i}" for i in range(10_000)])
    probe = np.array([f"absent-{i}" for i in range(20_000)], dtype=object)
    fpr = bf.might_contain_many(probe).mean()
    assert fpr < 0.03, f"observed FPR {fpr:.4f} should be near 1%"


def test_scalar_and_roundtrip():
    bf = BloomFilter.sized_for(100)
    bf.add_many(["a", "b"])
    assert bf.might_contain("a") and bf.might_contain("b")
    clone = BloomFilter.from_bytes(bf.to_bytes(), bf.n_bits, bf.n_hashes)
    assert clone.might_contain("a")
    assert not clone.might_contain_many(
        np.array([f"zz{i}" for i in range(64)], dtype=object)
    ).all()


def test_empty_and_determinism():
    bf = BloomFilter.sized_for(1000)
    bf.add_many([])
    assert not bf.might_contain("anything")
    b2 = BloomFilter.sized_for(1000)
    bf.add_many(["x", "y"])
    b2.add_many(["x", "y"])
    assert bytes(bf.to_bytes()) == bytes(b2.to_bytes())
