"""Byte-level BPE tokenizer: deterministic trainer + Arrow-vectorized counts.

A real training pipeline budgets documents by the TRAINING TOKENIZER's BPE
token counts, not regex word counts (text.token_count is the cheap JVM-side
regex proxy; the Gopher length gates and pack_sequences bin budgets want the
true count). This module is a from-scratch, dependency-free byte-level BPE
in the GPT-2 style (public: Sennrich et al. 2016 "Neural Machine
Translation of Rare Words with Subword Units"; Radford et al. 2019 GPT-2's
byte-level variant + pre-tokenizer regex):

- ``train_bpe``: deterministic trainer (ties broken lexicographically so
  the merges table is reproducible across runs/machines) — a driver-side
  utility run over a corpus sample; the merges table is small (the model's
  vocab, not the data) and ships to executors inside the UDF closure.
- ``bpe_token_count``: a pandas UDF (Arrow-batched) applying greedy
  lowest-rank merging, memoized per pre-token — natural text repeats words
  heavily, so per-batch cost is ~O(unique pre-tokens), not O(tokens).

Nothing here depends on external tokenizer packages; the merges format
(list of byte-pair tuples, rank = list position) matches the public BPE
convention so a real GPT-2 ``merges.txt`` could be loaded into it.
"""

from __future__ import annotations

import re
from typing import Iterable

import pandas as pd

# GPT-2's pre-tokenizer (public); bytes-level regex so no unicode deps.
_PRETOKEN_RE = re.compile(
    rb"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)


def pretokenize(text: str) -> list[bytes]:
    return _PRETOKEN_RE.findall(text.encode("utf-8", "replace"))


def train_bpe(texts: Iterable[str], num_merges: int) -> list[tuple[bytes, bytes]]:
    """Learn ``num_merges`` byte-pair merges from an iterable of texts.

    Deterministic: the most frequent pair wins each round, ties broken by
    the lexicographically smallest (left, right) byte pair."""
    word_freq: dict[tuple[bytes, ...], int] = {}
    for t in texts:
        for w in pretokenize(t):
            key = tuple(bytes([b]) for b in w)
            if len(key) > 1:
                word_freq[key] = word_freq.get(key, 0) + 1

    merges: list[tuple[bytes, bytes]] = []
    for _ in range(num_merges):
        pair_freq: dict[tuple[bytes, bytes], int] = {}
        for word, f in word_freq.items():
            for i in range(len(word) - 1):
                p = (word[i], word[i + 1])
                pair_freq[p] = pair_freq.get(p, 0) + f
        if not pair_freq:
            break
        best = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_freq: dict[tuple[bytes, ...], int] = {}
        for word, f in word_freq.items():
            out = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == best[0] and word[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            if len(out) > 1:
                key = tuple(out)
                new_freq[key] = new_freq.get(key, 0) + f
        word_freq = new_freq
        if not word_freq:
            break
    return merges


def _apply_bpe(word: bytes, ranks: dict[tuple[bytes, bytes], int]) -> int:
    """Greedy BPE: repeatedly merge the lowest-rank adjacent pair; returns
    the number of resulting tokens (counting is all the budget needs)."""
    parts = [bytes([b]) for b in word]
    while len(parts) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return len(parts)


def bpe_token_count_serial(text: str, merges: list[tuple[bytes, bytes]]) -> int:
    """Pure-serial reference: no memoization, no vectorization — the
    differential oracle for the UDF path."""
    ranks = {p: i for i, p in enumerate(merges)}
    return sum(_apply_bpe(w, ranks) for w in pretokenize(text))


def bpe_token_count(col, merges: list[tuple[bytes, bytes]]):
    """Column of true-BPE token counts (LongType) for a string column.

    Arrow-batched pandas UDF; per-batch memo over pre-tokens makes the cost
    ~O(unique words per batch). The merges table rides the UDF closure
    (one deserialize per executor plan, same as a broadcast for tables of
    vocab size)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    ranks = {p: i for i, p in enumerate(merges)}

    @pandas_udf("long")
    def _count(s: pd.Series) -> pd.Series:
        memo: dict[bytes, int] = {}
        out = []
        for t in s:
            if t is None:
                out.append(0)
                continue
            n = 0
            for w in _PRETOKEN_RE.findall(t.encode("utf-8", "replace")):
                c = memo.get(w)
                if c is None:
                    c = _apply_bpe(w, ranks)
                    memo[w] = c
                n += c
            out.append(n)
        return pd.Series(out, dtype="int64")

    c = F.col(col) if isinstance(col, str) else col
    return _count(c)


def _bytes_to_unicode() -> dict[int, str]:
    """GPT-2's public byte<->printable-unicode table: printable latin-1
    bytes map to themselves; the rest shift into 256+ codepoints so the
    space-separated merges.txt format stays unambiguous."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAC + 1))
        + list(range(0xAE, 0xFF + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


_B2U = _bytes_to_unicode()
_U2B = {u: b for b, u in _B2U.items()}


def _tok_to_text(tok: bytes) -> str:
    return "".join(_B2U[b] for b in tok)


def _tok_from_text(s: str) -> bytes:
    return bytes(_U2B[ch] for ch in s)


def merges_to_text(merges: list[tuple[bytes, bytes]]) -> str:
    """Serialize merges in the public merges.txt convention (GPT-2
    byte-to-unicode escaping, one 'left right' pair per line)."""
    return "\n".join(_tok_to_text(a) + " " + _tok_to_text(b) for a, b in merges)


def merges_from_text(text: str) -> list[tuple[bytes, bytes]]:
    out = []
    for line in text.splitlines():
        if not line or line.startswith("#"):
            continue
        a, _, b = line.partition(" ")
        out.append((_tok_from_text(a), _tok_from_text(b)))
    return out
