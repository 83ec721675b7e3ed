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

At cluster scale the bitsets live one-per-shard (e.g. 1024 shards × 256 MB
≈ bits for 10^10 keys at ~1% fpp) and are broadcast per round; here the
same structure at toy size.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


def _bloom_hashes(url: str, n_hashes: int, n_bits: int) -> list[int]:
    d = hashlib.md5(url.encode()).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:16], "big") | 1
    return [((h1 + i * h2) % n_bits) for i in range(n_hashes)]


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
        for u in urls:
            for b in _bloom_hashes(u, self.n_hashes, self.n_bits):
                self.bits[b >> 3] |= 1 << (b & 7)

    def might_contain(self, url: str) -> bool:
        return all(
            self.bits[b >> 3] & (1 << (b & 7))
            for b in _bloom_hashes(url, self.n_hashes, self.n_bits)
        )

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, n_bits: int, n_hashes: int) -> "BloomFilter":
        return cls(n_bits, n_hashes, np.frombuffer(data, dtype=np.uint8).copy())
