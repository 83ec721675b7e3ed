"""Text-analysis operators for training-data pipelines (task brief: lang-id,
quality scoring, token counting, document fingerprinting) — all pure Column
expressions (JVM-side, codegen, pushdown-friendly); zero Python in the row
path.

Where a deterministic hash must agree with an external oracle (DuckDB), we
use md5-prefix → integer, available identically on both engines; the
engine-internal fast path would be xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword profiles (public knowledge; heuristic lang-id
# by stopword hit-rate, the classic n-gram/stopword approach).
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "fr": ["le", "la", "et", "de", "un", "une", "est"],
    "es": ["el", "la", "y", "de", "un", "una", "es"],
    "de": ["der", "die", "und", "das", "ein", "ist", "zu"],
}

TOKEN_RE = r"[a-zA-Z0-9_]+|[^a-zA-Z0-9_\s]"  # BPE-ish: words + punct marks


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    """Whitespace token count + punctuation-aware regex token count would
    differ; this is the regex ('BPE-ish') count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(TOKEN_RE))


def whitespace_token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def stopword_hits(col: Column | str, lang: str) -> Column:
    ws = tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(ws, lambda w: F.array_contains(sw, F.lower(w))))


def lang_id(col: Column | str) -> Column:
    """argmax over per-language stopword hit-rates; 'und' when nothing hits.
    (The reference's NlpTF is an empty stub, etl.py:641-642.)"""
    ws = tokens(col)
    n = F.greatest(F.size(ws), F.lit(1))
    scores = [(lang, stopword_hits(col, lang) / n) for lang in STOPWORDS]
    best_score: Column = F.lit(0.0)
    for _, s in scores:
        best_score = F.greatest(best_score, s)
    out = F.lit("und")
    for lang, s in reversed(scores):  # earlier langs win ties
        out = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(out)
    return out


def quality_score(col: Column | str) -> Column:
    """Heuristic quality in [0,1]: length band + alpha ratio + stopword
    presence — the standard cheap pre-filter for web-scale corpora."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    n_alpha = F.length(F.regexp_replace(c, r"[^a-zA-Z]", ""))
    n_words = F.size(tokens(c))
    alpha_ratio = n_alpha / F.greatest(n_chars, F.lit(1))
    len_ok = F.when((n_words >= 20) & (n_words <= 1000), F.lit(1.0)).otherwise(F.lit(0.5))
    sw = stopword_hits(c, "en") / F.greatest(n_words, F.lit(1))
    sw_ok = F.when(sw > 0.02, F.lit(1.0)).otherwise(F.lit(0.6))
    return F.round((alpha_ratio + len_ok + sw_ok) / 3.0, 4)


def word_hash32(w: Column) -> Column:
    """32-bit deterministic word hash shared with SQL oracles:
    int(md5(w)[:8], 16)."""
    return F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long")


FP_MOD = (1 << 31) - 1


def fingerprint(col: Column | str) -> Column:
    """Order-sensitive rolling (polynomial) hash over words, mod 2^31-1 —
    a document fingerprint that, unlike set-hashes, distinguishes
    permutations."""
    ws = tokens(col)
    return F.aggregate(
        ws,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * 31 + word_hash32(w)) % F.lit(FP_MOD),
    )


def with_text_features(df: DataFrame, col: str = "text") -> DataFrame:
    return (
        df.withColumn("lang_pred", lang_id(col))
        .withColumn("quality", quality_score(col))
        .withColumn("n_tokens", token_count(col))
        .withColumn("fp", fingerprint(col))
    )
