"""Sharded exact URL-seen set with per-shard Bloom fast-path.

Generalizes the reference's in-memory seen set (RepeatFT's ``set``,
reference etl.py:238-247) and CrawlerTF's 100-URL memo (etl.py:454-464) to
10^10-URL scale:

  - authority = an exact table ``(shard, url_hash, url, round)`` sharded by
    ``pmod(xxhash64(url), S)`` — membership is an anti-join, which Spark
    executes as a shuffled hash join per shard;
  - fast path = one Bloom bitset per shard (numpy bitarray, double
    hashing). Bloom-negative candidates are *definitely new* and skip the
    anti-join entirely; only Bloom-positives (a small fraction at steady
    state) pay the exact check. No false negatives → the final seen set is
    exact (north_rule demands exact parity; SURVEY.md §7 hard part #2).

All add/membership paths are numpy-vectorized (two siphash64 passes via
``pd.util.hash_array`` + double hashing) — per-URL Python here was the
serial Amdahl term that capped scaling efficiency: the driver applies
``add_many`` over every newly-seen URL each round.

At cluster scale the bitsets live one-per-shard (e.g. 1024 shards × 256 MB
≈ bits for 10^10 keys at ~1% fpp) and are broadcast per round; here the
same structure at toy size.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

# hash_key must be exactly 16 bytes; two fixed keys → two independent
# 64-bit hash families, combined by double hashing (h1 + i*h2 mod m).
_K1 = "etlpy_bloom_h1_0"
_K2 = "etlpy_bloom_h2_1"


def _hash2(urls) -> tuple[np.ndarray, np.ndarray]:
    arr = np.asarray(urls, dtype=object)
    h1 = pd.util.hash_array(arr, hash_key=_K1, categorize=False)
    h2 = pd.util.hash_array(arr, hash_key=_K2, categorize=False) | np.uint64(1)
    return h1, h2


class BloomFilter:
    def __init__(self, n_bits: int, n_hashes: int, bits: np.ndarray | None = None):
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bits = bits if bits is not None else np.zeros(n_bits // 8 + 1, dtype=np.uint8)

    @classmethod
    def sized_for(cls, n_items: int, fpp: float = 0.01) -> "BloomFilter":
        n_items = max(n_items, 64)
        n_bits = int(-n_items * math.log(fpp) / (math.log(2) ** 2))
        n_hashes = max(1, int(round(n_bits / n_items * math.log(2))))
        return cls(n_bits, n_hashes)

    def add_many(self, urls) -> None:
        if len(urls) == 0:
            return
        h1, h2 = _hash2(urls)
        m = np.uint64(self.n_bits)
        for i in range(self.n_hashes):
            pos = (h1 + np.uint64(i) * h2) % m  # uint64 add wraps mod 2^64 — fine, deterministic
            byte_idx = (pos >> np.uint64(3)).astype(np.int64)
            bit = np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8))
            np.bitwise_or.at(self.bits, byte_idx, bit)

    def might_contain_many(self, urls) -> np.ndarray:
        n = len(urls)
        if n == 0:
            return np.zeros(0, dtype=bool)
        h1, h2 = _hash2(urls)
        m = np.uint64(self.n_bits)
        out = np.ones(n, dtype=bool)
        for i in range(self.n_hashes):
            pos = (h1 + np.uint64(i) * h2) % m
            byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
            out &= (np.right_shift(byte, (pos & np.uint64(7)).astype(np.uint8)) & 1).astype(bool)
            if not out.any():
                break
        return out

    def might_contain(self, url: str) -> bool:
        return bool(self.might_contain_many([url])[0])

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, n_bits: int, n_hashes: int) -> "BloomFilter":
        return cls(n_bits, n_hashes, np.frombuffer(data, dtype=np.uint8).copy())
